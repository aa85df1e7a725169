"""Host-side utilities: visualization, HTML reports."""

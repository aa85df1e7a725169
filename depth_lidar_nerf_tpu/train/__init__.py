"""Training subsystem: config, losses, train state, jitted steps, driver."""

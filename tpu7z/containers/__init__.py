"""Archive/container formats (reference L4 analog)."""

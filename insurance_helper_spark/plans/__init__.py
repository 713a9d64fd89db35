"""Plan-audit utilities (physical-plan assertions for scale properties)."""

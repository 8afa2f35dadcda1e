"""Query plans: the driver-contract query registry and the flagship pipeline."""

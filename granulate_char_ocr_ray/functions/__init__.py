"""Pure, deterministic NumPy / stdlib functions shared by the Ray stages
and the single-process oracle. Nothing in here imports ray."""

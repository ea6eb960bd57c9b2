from .checkpoint import (  # noqa: F401
    ConfigMismatchError,
    config_hash,
    run_partitioned_kg,
    read_manifest,
)

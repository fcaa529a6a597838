from .cdc import (  # noqa: F401
    derive_changelog, consolidate, snapshot_from_inserts, apply_changes,
    cdc_merge,
)

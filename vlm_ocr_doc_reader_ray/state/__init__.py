"""Checkpoint / lineage state (the reference's workspace, columnar)."""

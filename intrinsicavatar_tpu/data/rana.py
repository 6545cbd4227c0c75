"""RANA dataset registration lives in synthetichuman.py (shared loader)."""

from intrinsicavatar_tpu.data.synthetichuman import RanaDataset  # noqa: F401

"""Output and checkpointing."""

from navierstokes_tpu.io.output import FieldWriter, write_boundary_markers  # noqa: F401
from navierstokes_tpu.io.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401

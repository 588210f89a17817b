"""Training: XE (teacher forcing) and SCST, data-parallel over the mesh.

SURVEY.md §3.3 / §4.1 / §4.4 reconstructed reference loops, rebuilt as
jitted sharded steps + a thin host epoch driver.
"""

from captionkit.train.state import TrainState, create_train_state  # noqa: F401
from captionkit.train.xe import make_xe_train_step, make_eval_loss_step  # noqa: F401
from captionkit.train.checkpoint import (  # noqa: F401
    CheckpointManager,
)

"""Models: DCNet and EditNet behind one functional step protocol.

SURVEY.md §8.1 step 3: "DCNet and EditNet ... with a shared DecoderStep
protocol: step(params, state, token, ctx) -> (state, logits). One step
function serves teacher forcing (lax.scan), greedy and beam decode, and
SCST rollouts — single source of numeric truth."
"""

from captionkit.models.base import (  # noqa: F401
    ModelDef,
    teacher_forcing_logits,
)
from captionkit.models.registry import get_model  # noqa: F401
from captionkit.models.ensemble import (  # noqa: F401
    ensemble_model,
    load_ensemble_params,
    stack_params,
)
from captionkit.models import dcnet, editnet  # noqa: F401

"""Numerics core (SURVEY.md §8.1 step 2).

Pure-jnp definitions of every cell the models use. These are the single
source of numeric truth: the Pallas kernels in ``captionkit.ops`` must match
them (tests enforce it), and the models call through the dispatch layer in
``captionkit.nn.dispatch`` so kernels can be swapped without touching model
code.
"""

from captionkit.nn.cells import (  # noqa: F401
    LSTMParams,
    CopyLSTMParams,
    lstm_cell,
    copy_lstm_cell,
    init_lstm,
    init_copy_lstm,
)
from captionkit.nn.attention import (  # noqa: F401
    AdditiveAttentionParams,
    additive_attention,
    init_additive_attention,
    scma_select,
)
from captionkit.nn.masking import length_mask, mask_logits  # noqa: F401
from captionkit.nn.dispatch import (  # noqa: F401
    get_lstm_cell_fn,
    get_copy_lstm_cell_fn,
    get_attention_fn,
)

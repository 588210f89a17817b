"""Input pipeline: vocabulary, tokenization, static-shape batching.

Replaces the reference's offline prep scripts + torch Dataset/DataLoader
(SURVEY.md §2 L1/L2, §3.1) with a TPU-feedable pipeline: everything host-side
is NumPy, every array handed to the device has a static shape, variable
length is carried as explicit length/mask arrays.
"""

from captionkit.data.vocab import (  # noqa: F401
    PAD, START, END, UNK,
    PAD_TOKEN, START_TOKEN, END_TOKEN, UNK_TOKEN,
    Vocab,
)
from captionkit.data.tokenize import ptb_tokenize, simple_tokenize  # noqa: F401
from captionkit.data.pipeline import (  # noqa: F401
    Batch,
    encode_captions,
    pad_to,
    make_batches,
)
from captionkit.data.sources import (  # noqa: F401
    CaptionDataset,
    SyntheticCaptionSource,
    load_hdf5_features,
)
from captionkit.data.featquant import (  # noqa: F401
    FEED_DTYPES,
    dequantize_features,
    quantize_features,
)

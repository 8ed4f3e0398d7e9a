from .labels import (
    get_vocabulary,
    str_filt,
    CTCLabelConverter,
    AttentionLabelConverter,
    VisionLANConverter,
)
from .seed import set_seed

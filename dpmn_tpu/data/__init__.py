from .collate import (
    AlignCollate,
    ServingCollate,
    resize_normalize,
    resize_quantized,
    label_one_hot,
    interspace_pad,
)
from .datasets import TextZoomLMDB, SyntheticTextZoom, ConcatDataset, DataLoader
from .glyph import GlyphRenderer, make_standard_text, get_renderer, glyph_prior_from_ids
from .lmdb_reader import LMDBReader

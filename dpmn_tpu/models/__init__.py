from .bicubic import Bicubic
from .stn import STNHead
from .tps import TPSSpatialTransformer
from .tsrn import TSRN, TSRN_TL
from .crnn import CRNN, parse_crnn_input
from .pgrm import PGRM
from .cmm import CMM
from .distill import DistillModule

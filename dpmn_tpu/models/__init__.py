from .bicubic import Bicubic
from .stn import STNHead
from .tps import TPSSpatialTransformer
from .tsrn import TSRN, TSRN_TL
from .crnn import CRNN, parse_crnn_input
from .aster import RecognizerBuilder, parse_aster_input
from .moran import MORAN, parse_moran_input
from .visionlan import VisionLAN, parse_visionlan_input
from .tbsrn import TBSRN
from .tatt import TSRN_TL_TRANS
from .pgrm import PGRM
from .cmm import CMM
from .distill import DistillModule

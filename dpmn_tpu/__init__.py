"""dpmn_tpu — a TPU-native Scene Text Image Super-Resolution framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the DPMN
reference ("Improving Scene Text Image Super-Resolution via Dual Prior
Modulation Network", AAAI 2023): a plug-and-play dual-prior refiner over a
frozen Prior Super-resolution Network (PSN), evaluated by PSNR/SSIM and the
word accuracy of frozen scene-text recognizers on TextZoom.

Conventions (TPU-first, deliberately different from the torch reference):
  * images are float32 NHWC in [0, 1] everywhere on device
  * every model is a flax.linen module; parameters live in one pytree
  * the full train step (PSN + dual PGRM branches + distill + CMM + loss +
    grads + Adam update) is a single jitted function; the glyph prior is a
    shape-static host callback, the mask prior is computed on device
  * data parallelism is a 1-D jax.sharding.Mesh with batch sharding; there
    is no DataParallel-style replication (reference interfaces/base.py:160-162)
"""

__version__ = "0.1.0"

from .config import Args, TrainCfg, load_train_cfg, parse_pgrm_hparams  # noqa: E402
from .losses import image_loss, gradient_prior_loss  # noqa: E402


def system(*args, **kwargs):
    from .system import DPMNSystem

    return DPMNSystem(*args, **kwargs)


def trainer(*args, **kwargs):
    from .train import Trainer

    return Trainer(*args, **kwargs)

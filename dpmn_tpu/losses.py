"""Image reconstruction losses (reference loss/image_loss.py:5-44).

ImageLoss = w0 * MSE + w1 * GradientPriorLoss, where the gradient prior is
the L1 distance between central-difference gradient-magnitude maps of the
first 3 channels.  The driver instantiates it with loss_weight=[1, 1]
(interfaces/base.py:132) and multiplies by 100 in the cascade
(interfaces/super_resolution.py:212).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gradient_map(x: jax.Array) -> jax.Array:
    """Central-difference gradient magnitude, NHWC.

    Parity with loss/image_loss.py:34-44: the shifted copies are produced by
    zero padding + slicing, so the image border sees one-sided differences
    against an implicit zero row/column.
    """
    w = x.shape[2]
    h = x.shape[1]
    # torch pads in NCHW (left,right,top,bottom); replicate the same zero-pad
    # + slice semantics along the NHWC spatial axes.
    r = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    l = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w, :]
    t = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :h, :, :]
    b = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:, :, :]
    return jnp.sqrt(((r - l) * 0.5) ** 2 + ((t - b) * 0.5) ** 2 + 1e-6)


def gradient_prior_loss(out_images: jax.Array, target_images: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(gradient_map(out_images) - gradient_map(target_images)))


def image_loss(
    out_images: jax.Array,
    target_images: jax.Array,
    gradient: bool = False,
    loss_weight=(1.0, 1.0),
) -> jax.Array:
    """w0*MSE (+ w1*gradient prior over first 3 channels), NHWC."""
    loss = loss_weight[0] * jnp.mean((out_images - target_images) ** 2)
    if gradient:
        loss = loss + loss_weight[1] * gradient_prior_loss(out_images[..., :3], target_images[..., :3])
    return loss


def sequence_cross_entropy_loss(
    logits: jax.Array,
    targets: jax.Array,
    lengths: jax.Array,
    sequence_normalize: bool = False,
    sample_normalize: bool = True,
) -> jax.Array:
    """ASTER's attention-decoder training loss
    (reference model/recognizer/sequenceCrossEntropyLoss.py:36-66).

    logits: (B, T, n_class) decoder scores; targets: (B, >=T) int labels;
    lengths: (B,) valid step counts.  Per-step CE is summed over the first
    ``lengths[i]`` steps of each sample, then normalized by the total valid
    step count (sequence_normalize) or the batch size (sample_normalize) —
    the reference asserts the two flags are mutually exclusive and defaults
    to sample_normalize.  ASTER is frozen inside the DPMN flow; this exists
    for standalone recognizer training parity.
    """
    assert not (sequence_normalize and sample_normalize) or not sequence_normalize
    b, t = logits.shape[0], logits.shape[1]
    targets = targets[:, :t]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(logits.dtype)  # (B, T)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    out = jnp.sum(-picked * mask)
    if sequence_normalize:
        out = out / jnp.sum(mask)
    if sample_normalize:
        out = out / b
    return out

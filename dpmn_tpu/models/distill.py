"""Deep-to-shallow self-distillation module (reference model/distill_module.py:4-31).

cat(deep, shallow) → conv(6→3)+BN+ReLU vs conv(shallow)(3→3)+BN+ReLU; the L1
between the two features is the distill loss, and the cat-feature is passed
down the cascade (interfaces/super_resolution.py:245-263).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DistillModule(nn.Module):
    @nn.compact
    def __call__(self, x_deep: jax.Array, x_shallow: jax.Array, train: bool = False):
        bn = lambda t, n: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=n)(t)
        cat = jnp.concatenate([x_deep, x_shallow], axis=-1)
        feature_cat = nn.relu(bn(nn.Conv(3, (3, 3), padding=1, name="conv_cat_feature")(cat), "bn_1"))
        feature_shallow = nn.relu(bn(nn.Conv(3, (3, 3), padding=1, name="conv_feature")(x_shallow), "bn_2"))
        loss = jnp.mean(jnp.abs(feature_cat - feature_shallow))
        return loss, feature_cat

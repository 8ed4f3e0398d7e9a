"""VisionLAN standalone curriculum training (LF_1 → LF_2 → LA) + evaluator.

Parity: reference model/VisionLAN/train_LF_1.py / train_LF_2.py / train_LA.py
(the three are one loop with a step switch) and eval.py:85-147 —
  * LF_1: VRM only, CE over per-sample-length-flattened logits
  * LF_2/LA: + 0.5 * CE(remaining-string branch) + 0.5 * CE(occluded-char
    branch); LF_2 additionally trains the MLM at full lr and everything
    else at 0.1x (generate_optimizer, train_LA.py:66-79)
  * grad clip at global norm 20 (train_LA.py:173)
  * label flattening keeps ids up to and including the first 0/EOS
    (flatten_label, train_LA.py:14-23); here it is a fixed-shape mask

TPU formulation: one jitted step; the variable-length CE flattening becomes
a mask over (B, L+1) so shapes stay static.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.visionlan import VisionLAN
from .utils.labels import VisionLANConverter
from .utils.text_metrics import AttentionARCounter


def label_mask(targets: jax.Array) -> jax.Array:
    """(B, L) int targets (0-padded) → float mask keeping ids up to and
    including the first 0 (flatten_label parity)."""
    is_zero = targets == 0
    first_zero = jnp.argmax(is_zero, axis=1)
    has_zero = is_zero.any(axis=1)
    length = jnp.where(has_zero, first_zero + 1, targets.shape[1])
    pos = jnp.arange(targets.shape[1])[None, :]
    return (pos < length[:, None]).astype(jnp.float32)


def masked_ce(logits: jax.Array, targets: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean CE over masked positions ((N, C) flatten parity)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    l = logits.shape[1]
    tgt = targets[:, :l]
    m = mask[:, :l]
    nll = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


class VisionLANTrainer:
    def __init__(self, step: str = "LA", lr: float = 1e-4, seed: int = 0):
        assert step in ("LF_1", "LF_2", "LA")
        self.step = step
        self.model = VisionLAN()
        self.converter = VisionLANConverter()
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((2, 64, 256, 3))
        # init with the LA step so MLM/pp_share params always exist (the
        # torch module owns them in every curriculum stage)
        variables = self.model.init(rng, dummy, jnp.zeros((2,), jnp.int32), "LA", train=True)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        if step == "LF_2":
            # MLM + shared prediction head at lr, backbone at 0.1x lr
            def label_fn(params):
                def mark(path, _):
                    top = path[0].key if hasattr(path[0], "key") else path[0]
                    return "mlm" if top in ("MLM", "pp_share", "w_share") else "base"

                return jax.tree_util.tree_map_with_path(mark, params)

            self.tx = optax.chain(
                optax.clip_by_global_norm(20.0),
                optax.multi_transform(
                    {"mlm": optax.adam(lr), "base": optax.adam(lr * 0.1)}, label_fn
                ),
            )
        else:
            self.tx = optax.chain(optax.clip_by_global_norm(20.0), optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        self.train_step = jax.jit(self._train_step)

    def _loss(self, params, batch_stats, batch, rng):
        images, targets, targets_res, targets_sub, label_pos = batch
        variables = {"params": params, "batch_stats": batch_stats}
        if self.step == "LF_1":
            (text_pre, _, _, _), mut = self.model.apply(
                variables, images, label_pos, "LF_1", train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            loss = masked_ce(text_pre, targets, label_mask(targets))
            return loss, (mut, {"loss_ori": loss})
        (text_pre, text_rem, text_mas, _), mut = self.model.apply(
            variables, images, label_pos, self.step, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        loss_ori = masked_ce(text_pre, targets, label_mask(targets))
        loss_res = masked_ce(text_rem, targets_res, label_mask(targets_res))
        loss_mas = masked_ce(text_mas, targets_sub, label_mask(targets_sub))
        loss = loss_ori + 0.5 * loss_res + 0.5 * loss_mas
        return loss, (mut, {"loss_ori": loss_ori, "loss_res": loss_res, "loss_mas": loss_mas})

    def _train_step(self, params, batch_stats, opt_state, batch, rng):
        (loss, (mut, aux)), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, batch_stats, batch, rng
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut.get("batch_stats", batch_stats), opt_state, {"loss": loss, **aux}

    def fit_batch(self, images, labels, labels_res=None, labels_sub=None, label_pos=None, rng=None):
        """Host-facing step: encodes labels, pads to 26, runs the jit step."""
        def enc(ls):
            t = self.converter.encode(ls)
            out = np.zeros((len(ls), 26), np.int64)
            out[:, : t.shape[1]] = t[:, :26]
            return jnp.asarray(out)

        b = len(labels)
        batch = (
            jnp.asarray(images),
            enc(labels),
            enc(labels_res or labels),
            enc(labels_sub or [l[:1] or "a" for l in labels]),
            jnp.asarray(label_pos if label_pos is not None else np.zeros(b, np.int32)),
        )
        rng = rng if rng is not None else jax.random.PRNGKey(int(np.random.randint(1 << 31)))
        self.params, self.batch_stats, self.opt_state, metrics = self.train_step(
            self.params, self.batch_stats, self.opt_state, batch, rng
        )
        return {k: float(v) for k, v in metrics.items()}

    def evaluate(self, images, labels) -> Dict[str, float]:
        """eval.py:85-147 equivalent over one batch."""
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        logits, out_length = self.model.apply(variables, jnp.asarray(images), train=False)
        probs = jax.nn.softmax(logits, axis=-1)
        counter = AttentionARCounter("test accuracy:")
        texts = []
        for p, l in zip(np.asarray(probs), np.asarray(out_length)):
            ids = p[: int(l)].argmax(-1)
            texts.append(self.converter.decode_ids(ids))
        counter.add_iter(texts, list(labels))
        return counter.metrics()

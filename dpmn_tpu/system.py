"""DPMN system: model bundle + jitted train/eval steps.

This is the TPU-native re-design of the reference driver
(interfaces/super_resolution.py:25-337 train, :340-513 eval, :515-776 test).
Everything the reference does per batch — frozen PSN forward, the dual PGRM
cascade with glyph/mask priors, the distill cascade, CMM fusion, the joint
loss, per-module gradient clipping and the Adam update — happens inside ONE
jitted function over ONE train-state pytree.  The reference's host-side
per-sample loops become:
  * VisionLAN student inference: batched on device (vs per-sample at
    super_resolution.py:177-193)
  * glyph prior: a shape-static jax.pure_callback into the memoized host
    renderer (glyph_mode='callback'), a device-side zeros stub for sharding
    dry-runs ('zeros'), or skipped entirely
  * mask prior: fully on device (ops/mask_prior.py vs util.py:27-35)

Cascade algebra parity notes (super_resolution.py):
  * branch-1 residuals: cascade_list[:k] (:207); branch-2: list[:(k - b2)] (:234)
  * per-iteration loss: ImageLoss(sr, hr[:, :3]) * 100 (:212,:239)
  * distill runs deep→shallow per branch, loss * 100 (:245-263)
  * total loss divided by (b1 + b2 + 1) (:269)
  * per-module grad clip at 0.25 (:272-277), one Adam over everything (:123)
  * recognizer students receive no gradient in the reference (the glyph
    render breaks the graph; prob_lr is dead) — they are held frozen here.
"""

from __future__ import annotations


from dataclasses import dataclass
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import Args, TrainCfg, parse_pgrm_hparams
from .data.glyph import glyph_prior_from_ids
from .losses import image_loss
from .models.cmm import CMM
from .models.crnn import CRNN, parse_crnn_input
from .models.distill import DistillModule
from .models.pgrm import PGRM
from .models.tatt import TSRN_TL_TRANS
from .models.tbsrn import TBSRN
from .models.tsrn import TSRN, TSRN_TL
from .models.visionlan import VisionLAN, parse_visionlan_input
from .ops.mask_prior import to_mask
from .utils.labels import DIC_36


def _tree_norm(tree):
    """Per-leaf sum-of-squares, added as scalars.

    NOTE (measured, v5e): do NOT "optimize" this into one concatenated
    reduction — jnp.concatenate of ~130 raveled grad leaves lowers to
    hundreds of tiny relayout DMA copies and regressed the train step
    214 ms -> 1306 ms.  The per-leaf reduces fuse into the backward
    fusions that produce each grad and cost ~10 ms total."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def per_module_clip(max_norm: float) -> optax.GradientTransformation:
    """torch clip_grad_norm_(0.25) applied per top-level module subtree
    (interfaces/super_resolution.py:272-277)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip_tree(tree):
            norm = _tree_norm(tree)
            scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
            return jax.tree_util.tree_map(lambda g: g * scale, tree)

        return {k: clip_tree(v) for k, v in updates.items()}, state

    return optax.GradientTransformation(init_fn, update_fn)


@dataclass
class DPMNSystem:
    cfg: TrainCfg
    args: Args
    glyph_mode: str = "callback"  # 'callback' | 'zeros'
    donate_state: bool = False
    # Serving-mode dtype for the frozen VisionLAN students ('bfloat16' to
    # halve their MXU time).  The glyph prior consumes only the argmax of
    # the student logits, so reduced precision cannot perturb the prior
    # except on exact ties; None keeps the quirk-exact fp32 path.
    student_dtype: Any = None
    # Mixed-precision training ('bfloat16'): master params, the Adam state,
    # per-module clipping and every per-iteration loss stay float32; the
    # forward/backward compute (PSN, students, PGRMs, distill, CMM) runs in
    # bfloat16.  The train step is neither FLOP- nor bandwidth-saturated but
    # op-granularity-bound (ROADMAP.md) — bf16 halves the bytes of every
    # relayout copy and tiles (16,128) instead of (8,128).  None keeps the
    # quirk-exact fp32 path (the reference trains fp32 CUDA,
    # interfaces/super_resolution.py:269-278).
    train_dtype: Any = None
    # Diagnostic bisect knob for the AMP-cliff investigation (ROADMAP):
    # 'full' casts everything the real AMP step casts; 'frozen-only' casts
    # only the frozen nets + images (the forward chain), keeping the
    # differentiated cascade fp32; 'trainable-only' is the complement.
    amp_scope: str = "full"

    def __post_init__(self):
        a = self.args
        hp = parse_pgrm_hparams(a)
        self.b1, self.b2 = a.stu_iter_b1, a.stu_iter_b2
        self.n_pgrm = 2 if a.sr_share else self.b1 + self.b2
        img_size = (self.cfg.height, self.cfg.width)
        self.hr_shape = img_size

        def make_pgrm(iter_: int, graphic: bool) -> PGRM:
            i = min(iter_, len(hp.depths) - 1) if len(hp.depths) == 1 else iter_
            depths_clamped = [hp.depths[min(j, len(hp.depths) - 1)] for j in range(iter_ + 1)]
            return PGRM(
                depths_total=sum(hp.depths),
                depths_before=sum(depths_clamped[:-1]),
                img_size=img_size,
                patch_size=hp.patch_size[min(i, len(hp.patch_size) - 1)],
                embed_dim=hp.embed_dim[min(i, len(hp.embed_dim) - 1)],
                num_layers=hp.depths[min(i, len(hp.depths) - 1)],
                num_heads=tuple(hp.num_heads[min(i, len(hp.num_heads) - 1)]),
                window_size=tuple(hp.window_size[min(i, len(hp.window_size) - 1)]),
                mlp_ratio=float(hp.mlp_ratio[min(i, len(hp.mlp_ratio) - 1)]),
                drop_rate=float(hp.drop_rate[min(i, len(hp.drop_rate) - 1)]),
                attn_drop_rate=float(hp.attn_drop_rate[min(i, len(hp.attn_drop_rate) - 1)]),
                drop_path_rate=float(hp.drop_path_rate[min(i, len(hp.drop_path_rate) - 1)]),
                iter=iter_,
                graphic_mode=graphic,
                hidden_size=3,
                faithful=a.faithful,
            )

        # model_list layout parity (super_resolution.py:38-54): b1 graphic
        # PGRMs (mode=False → has prior_fusion), b2 semantic, then CMM.
        self.pgrms: List[PGRM] = []
        if a.sr_share:
            self.pgrms = [make_pgrm(0, True), make_pgrm(self.b1, False)]
        else:
            self.pgrms = [make_pgrm(k, True) for k in range(self.b1)]
            self.pgrms += [make_pgrm(k, False) for k in range(self.b1, self.b1 + self.b2)]
        self.cmm = CMM()
        self.n_distill = max(self.b1 + self.b2 - 2, 0)
        self.distills = [DistillModule() for _ in range(self.n_distill)]

        # PSN (frozen)
        psn_kw = dict(
            scale_factor=self.cfg.down_sample_scale,
            width=self.cfg.width,
            height=self.cfg.height,
            stn=a.STN,
            mask=a.mask,
            srb_nums=a.srb,
            hidden_units=a.hd_u,
        )
        if a.arch in ("tsrn", "tg"):
            self.psn = TSRN(**psn_kw)
        elif a.arch == "tbsrn":
            self.psn = TBSRN(**psn_kw)
        elif a.arch == "tpgsr":
            self.psn = TSRN_TL(**psn_kw)
        elif a.arch == "tatt":
            # the TPInterpreter d_model must equal the SRB channel count;
            # the reference hardcodes 64 == 2*32 (tatt.py:590 with hd_u=32)
            self.psn = TSRN_TL_TRANS(**psn_kw, out_text_channels=2 * a.hd_u, faithful=a.faithful)
        else:
            raise ValueError(a.arch)
        self.needs_text_prior = a.arch in ("tpgsr", "tatt")
        self.crnn_psn = CRNN() if self.needs_text_prior else None
        self.student = VisionLAN()  # trainable-in-name-only TPG (see docstring)
        self.charset = "".join(DIC_36)

        if self.glyph_mode == "atlas":
            from .data.glyph_atlas import make_device_glyph_fn

            self._device_glyph = make_device_glyph_fn(self.hr_shape, self.args.font_path)

        # Adam/AdamW selection (interfaces/base.py:220-271, beta1 from yaml)
        if self.cfg.optimizer == "AdamW":
            opt = optax.adamw(self.cfg.lr, b1=self.cfg.beta1, b2=0.999, eps=1e-8, weight_decay=0.01)
        else:
            opt = optax.adam(self.cfg.lr, b1=self.cfg.beta1, b2=0.999, eps=1e-8)
        self._adam = optax.chain(per_module_clip(0.25), opt)
        # jitted entry points (self is captured by closure, not traced);
        # donate_state=True lets XLA reuse the old state buffers in-place —
        # enable it in the real training loop, keep off when state is reused.
        self.train_step = jax.jit(
            self._train_step_impl, donate_argnums=(0,) if self.donate_state else ()
        )
        self.sr_forward = jax.jit(self._sr_forward_impl, static_argnums=(2,))
        # bf16 fast-eval: params and activations in bfloat16 (MXU native),
        # output recast to f32.  Trades ~1e-2 PSNR-scale numerics for ~2x
        # HBM-bandwidth relief — a serving mode, not the parity path.
        # The weight cast happens HOST-SIDE in sr_forward_bf16 (round-4 byte
        # audit: the round-3 in-graph tree-cast kept the graph's arguments
        # f32, so every step re-read the full 0.57 GB f32 weight set from
        # HBM and re-converted it on device).
        self._sr_forward_bf16_jit = jax.jit(self._sr_forward_bf16_impl, static_argnums=(2,))
        self._bf16_src = None  # identity of the last f32 state cast
        self._bf16_state = None

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, batch_size: int = 2) -> Dict[str, Any]:
        a = self.args
        in_ch = 4 if a.mask else 3
        lr_h = self.cfg.height // self.cfg.down_sample_scale
        lr_w = self.cfg.width // self.cfg.down_sample_scale
        dummy_lr = jnp.zeros((batch_size, lr_h, lr_w, in_ch))
        dummy_hr3 = jnp.zeros((batch_size, self.cfg.height, self.cfg.width, 3))
        dummy_glyph = jnp.zeros((batch_size, self.cfg.height, self.cfg.width, 2))
        dummy_emb = jnp.zeros((batch_size, 1, 26, 37))

        keys = jax.random.split(rng, 16)
        params: Dict[str, Any] = {}
        batch_stats: Dict[str, Any] = {}

        def split_vars(v):
            return v.get("params", {}), v.get("batch_stats", {})

        for i, m in enumerate(self.pgrms):
            x_q = dummy_glyph if m.graphic_mode else dummy_hr3
            v = m.init(keys[i % 16], x_q, dummy_hr3, ())
            params[f"pgrm_{i}"], bs = split_vars(v)
            if bs:
                batch_stats[f"pgrm_{i}"] = bs
        v = self.cmm.init(keys[10], dummy_hr3, dummy_hr3)
        params["cmm"], batch_stats["cmm"] = split_vars(v)
        for i, d in enumerate(self.distills):
            v = d.init(keys[11], dummy_hr3, dummy_hr3)
            params[f"distill_{i}"], batch_stats[f"distill_{i}"] = split_vars(v)

        frozen: Dict[str, Any] = {}
        if self.needs_text_prior:
            v = self.psn.init(keys[12], dummy_lr, dummy_emb, train=False)
        else:
            v = self.psn.init(keys[12], dummy_lr, train=False)
        frozen["psn"] = v
        if self.crnn_psn is not None:
            frozen["crnn_psn"] = self.crnn_psn.init(keys[13], jnp.zeros((batch_size, 32, 100, 1)), train=False)
        vl_in = jnp.zeros((batch_size, 64, 256, 3))
        for k in range(self.b1):
            frozen[f"student_{k}"] = self.student.init(keys[14], vl_in, train=False)

        opt_state = self._adam.init(params)
        return {
            "params": params,
            "batch_stats": batch_stats,
            "frozen": frozen,
            "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------- internals

    def _psn_forward(self, frozen, images_lr):
        """Frozen PSN forward in eval mode (super_resolution.py:156-169)."""
        if self.needs_text_prior:
            crnn_in = parse_crnn_input(images_lr[..., :3])
            logits = self.crnn_psn.apply(frozen["crnn_psn"], crnn_in, train=False)  # (T, B, 37)
            label_vecs = jax.nn.softmax(logits, axis=-1)
            # torch: (T,B,37) → permute(1,0,2) → (B,T,37) → unsqueeze(1) →
            # permute(0,3,1,2) = (B,37,1,T) NCHW ⇒ NHWC (B,1,T,37)
            emb = jnp.swapaxes(label_vecs, 0, 1)[:, None, :, :]
            if self.args.arch == "tatt":
                out, _ = self.psn.apply(frozen["psn"], images_lr, jax.lax.stop_gradient(emb), train=False)
            else:
                out = self.psn.apply(frozen["psn"], images_lr, emb, train=False)
        else:
            out = self.psn.apply(frozen["psn"], images_lr, train=False)
        return jax.lax.stop_gradient(out)

    def _cast_student(self, student_vars, vl_in):
        if self.student_dtype is not None:
            dt = jnp.dtype(self.student_dtype)
            cast = lambda t: t.astype(dt) if hasattr(t, "dtype") and t.dtype == jnp.float32 else t
            student_vars = jax.tree_util.tree_map(cast, student_vars)
            vl_in = vl_in.astype(dt)
        return student_vars, vl_in

    def _glyph_priors_shared(self, frozen, images):
        """All b1 glyph priors from ONE image — the test() quirk
        (super_resolution.py:648): every student reads images_lr_psn.  The
        b1 students are independent given the shared input, so they run as a
        single vmapped call over stacked params (one b1-times-wider MXU pass
        instead of b1 sequential ones); the prior composition batches the
        same way.  Returns a list of b1 (B, H, W, 2) priors."""
        b = images.shape[0]
        h, w = self.hr_shape
        if self.glyph_mode == "zeros":
            z = jnp.zeros((b, h, w, 2), images.dtype)
            return [z] * self.b1
        vl_in = parse_visionlan_input(images[..., :3])
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[frozen[f"student_{k}"] for k in range(self.b1)]
        )
        stacked, vl_in = self._cast_student(stacked, vl_in)
        logits, lengths = jax.vmap(
            lambda v: self.student.apply(v, vl_in, train=False)
        )(stacked)  # (b1, B, 25, C), (b1, B)
        preds = logits.argmax(-1).astype(jnp.int32).reshape(self.b1 * b, -1)
        lengths = lengths.astype(jnp.int32).reshape(self.b1 * b)
        priors = self._prior_from_preds(preds, lengths, b * self.b1, images.dtype)
        return [priors[k * b : (k + 1) * b] for k in range(self.b1)]

    def _glyph_prior(self, frozen, k, cascade_images):
        """Recognize the cascade image and render the 2-channel glyph prior.

        glyph_mode:
          'atlas'    — fully on-device composition (data/glyph_atlas.py);
                       required on runtimes without host callbacks
          'callback' — bit-parity host render via jax.pure_callback
          'zeros'    — stub for sharding dry-runs
        """
        b = cascade_images.shape[0]
        h, w = self.hr_shape
        if self.glyph_mode == "zeros":
            return jnp.zeros((b, h, w, 2), cascade_images.dtype)
        vl_in = parse_visionlan_input(cascade_images[..., :3])
        student_vars, vl_in = self._cast_student(frozen[f"student_{k}"], vl_in)
        logits, lengths = self.student.apply(student_vars, vl_in, train=False)
        preds = logits.argmax(-1).astype(jnp.int32)  # (B, 25), 0 = EOS
        lengths = lengths.astype(jnp.int32)
        return self._prior_from_preds(preds, lengths, b, cascade_images.dtype)

    def _prior_from_preds(self, preds, lengths, b, dtype):
        h, w = self.hr_shape
        if self.glyph_mode == "atlas":
            pos = jnp.arange(preds.shape[1])[None, :]
            ids = jnp.where(pos < lengths[:, None], preds, 0)
            # drop EOS/blank ids and compact left (the reference decodes them
            # to '' — model/VisionLAN/utils.py:36)
            order = jnp.argsort(ids == 0, axis=1, stable=True)
            ids = jnp.take_along_axis(ids, order, axis=1)
            eff_len = jnp.sum((ids > 0).astype(jnp.int32), axis=1)
            glyphs = self._device_glyph(ids, eff_len)
            return jax.lax.stop_gradient(glyphs.astype(dtype))

        font_path = self.args.font_path

        def host_render(preds_np, lengths_np):
            return glyph_prior_from_ids(preds_np, lengths_np, list(self.charset), font_path, (h, w))

        out_shape = jax.ShapeDtypeStruct((b, h, w, 2), jnp.float32)
        glyphs = jax.pure_callback(host_render, out_shape, preds, lengths)
        return jax.lax.stop_gradient(glyphs.astype(dtype))

    def _cascade(self, params, batch_stats, frozen, images_lr_psn, images_hr, train, rngs,
                 glyph_from_psn: bool = False):
        """Dual-branch PGRM cascade + distill + CMM. Returns (loss, sr, new_bs)."""
        a = self.args
        new_bs = dict(batch_stats)
        loss_total = 0.0
        mutable = ["batch_stats"] if train else False
        # losses always accumulate in float32 (identity when not in AMP)
        f32 = lambda t: t.astype(jnp.float32)

        def apply_pgrm(idx, x_q, x_kv, residuals):
            # parity quirk: with sr_share BOTH branches pick model_list[0]
            # (super_resolution.py:202-205,:229-232)
            mi = 0 if a.sr_share else idx
            name = f"pgrm_{mi}"
            m = self.pgrms[mi]
            variables = {"params": params[name]}
            if name in new_bs and new_bs[name]:
                variables["batch_stats"] = new_bs[name]
            out = m.apply(variables, x_q, x_kv, residuals, train=train, rngs=rngs, mutable=mutable)
            if mutable:
                sr, mut = out
                if "batch_stats" in mut:
                    new_bs[name] = mut["batch_stats"]
                return sr
            return out

        # ---- branch 1: graphic prior (:174-213)
        cascade = images_lr_psn
        b1_list = []
        # test() quirk: students read images_lr_psn every iteration instead
        # of the cascade (super_resolution.py:648) — which makes the b1
        # student passes independent, so they run as one vmapped call
        shared_priors = self._glyph_priors_shared(frozen, images_lr_psn) if glyph_from_psn else None
        for k in range(self.b1):
            x_q = shared_priors[k] if glyph_from_psn else self._glyph_prior(frozen, k, cascade)
            sr = apply_pgrm(k, x_q, cascade[..., :3], b1_list[:k])
            b1_list.append(sr)
            cascade = sr
            loss_total += image_loss(f32(sr), images_hr[..., :3], gradient=a.gradient) * 100.0

        # ---- branch 2: semantic prior (:218-240)
        cascade = images_lr_psn
        b2_list = []
        for k in range(self.b1, self.b1 + self.b2):
            x_q = jax.lax.stop_gradient(to_mask(cascade).astype(cascade.dtype))
            sr = apply_pgrm(k, x_q, cascade[..., :3], b2_list[: (k - self.b2)])
            b2_list.append(sr)
            cascade = sr
            loss_total += image_loss(f32(sr), images_hr[..., :3], gradient=a.gradient) * 100.0

        # ---- distill cascades (:245-263)
        def apply_distill(idx, deep, shallow):
            name = f"distill_{idx}"
            variables = {"params": params[name], "batch_stats": new_bs[name]}
            out = self.distills[idx].apply(variables, deep, shallow, train=train, mutable=mutable)
            if mutable:
                (l, feat), mut = out
                new_bs[name] = mut["batch_stats"]
                return l, feat
            return out

        feat = b1_list[-1]
        for k in range(self.b1 - 1, 0, -1):
            l, feat = apply_distill(k - 1, feat, b1_list[k - 1])
            loss_total += f32(l) * 100.0
        feat = b2_list[-1]
        for k in range(self.b2 - 1, 0, -1):
            l, feat = apply_distill(k + self.b1 - 2, feat, b2_list[k - 1])
            loss_total += f32(l) * 100.0

        # ---- CMM fusion (:265-269)
        variables = {"params": params["cmm"], "batch_stats": new_bs["cmm"]}
        out = self.cmm.apply(variables, b1_list[-1], b2_list[-1], train=train, mutable=mutable)
        if mutable:
            sr_final, mut = out
            new_bs["cmm"] = mut["batch_stats"]
        else:
            sr_final = out
        loss_total += image_loss(f32(sr_final), images_hr[..., :3], gradient=a.gradient) * 100.0
        loss_total = loss_total / (self.b1 + self.b2 + 1)
        return loss_total, sr_final, new_bs

    # ----------------------------------------------------------------- steps

    def _amp_frozen_cast(self, state, images_lr):
        """Apply the frozen-side AMP casts; returns (frozen, images_lr)."""
        frozen = state["frozen"]
        amp = self.train_dtype is not None
        if amp and self.amp_scope in ("full", "frozen-only"):
            dt = jnp.dtype(self.train_dtype)
            down = lambda t: t.astype(dt) if hasattr(t, "dtype") and t.dtype == jnp.float32 else t
            frozen = jax.tree_util.tree_map(down, frozen)
            images_lr = images_lr.astype(dt)
        return frozen, images_lr

    def _micro_grads(self, params, batch_stats, frozen, images_hr, images_lr, rng):
        """value_and_grad over one (micro)batch — shared by the plain train
        step and the gradient-accumulation step.  `frozen`/`images_lr` must
        already be AMP-cast (see _amp_frozen_cast); `params` are the float32
        masters.  Returns (loss, grads, new_batch_stats), all float32."""
        amp_train = self.train_dtype is not None and self.amp_scope in ("full", "trainable-only")
        if amp_train:
            dt = jnp.dtype(self.train_dtype)
            down = lambda t: t.astype(dt) if hasattr(t, "dtype") and t.dtype == jnp.float32 else t
        images_lr_psn = self._psn_forward(frozen, images_lr)
        rngs = {"dropout": rng}

        def loss_fn(p):
            if amp_train:
                # cast-through-grad: cotangents flow back through the astype,
                # so grads land float32 on the float32 master params
                p = jax.tree_util.tree_map(down, p)
                bs = jax.tree_util.tree_map(down, batch_stats)
            else:
                bs = batch_stats
            loss, sr, new_bs = self._cascade(p, bs, frozen, images_lr_psn, images_hr, True, rngs)
            return loss, (sr, new_bs)

        (loss, (_, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if amp_train:
            up = lambda t: t.astype(jnp.float32) if hasattr(t, "dtype") and t.dtype == dt else t
            new_bs = jax.tree_util.tree_map(up, new_bs)
        return loss, grads, new_bs

    def _apply_update(self, state, grads, new_bs, loss):
        # pre-clip global grad norm: costs one fused reduce over buffers the
        # update reads anyway; reported so training curves (and the accum
        # oracle test) can see the raw gradient scale Adam would hide
        grad_norm = optax.global_norm(grads)
        updates, new_opt = self._adam.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "batch_stats": new_bs,
            # the ORIGINAL frozen tree, not the AMP down-cast: returning the
            # bf16 copy changes the state's avals after step 1, forcing a
            # recompile of every subsequent step (measured as a one-time
            # multi-minute stall through the remote compile service) and
            # silently degrading later fp32 eval on the same state.
            "frozen": state["frozen"],
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    def _train_step_impl(self, state, images_hr, images_lr, rng):
        frozen, images_lr = self._amp_frozen_cast(state, images_lr)
        loss, grads, new_bs = self._micro_grads(
            state["params"], state["batch_stats"], frozen, images_hr, images_lr, rng
        )
        return self._apply_update(state, grads, new_bs, loss)

    def _accum_train_step_impl(self, state, images_hr, images_lr, rng, accum_steps: int,
                               microbatch_sharding=None):
        """One optimizer step over `accum_steps` sequential microbatches.

        TPU path to the reference's shipped batch 1024
        (config/super_resolution.yaml:9) on one chip: the flagship joint
        step accesses ~2.3 GB of activations per 64 images, so batch 1024
        in one graph would blow HBM — instead the global batch is split
        into accum_steps microbatches run under lax.scan, grads are
        AVERAGED (matching the big-batch mean loss), and ONE Adam update is
        applied (per-module clipping on the averaged grads, exactly where
        the reference clips its big-batch grads,
        interfaces/super_resolution.py:272-277).

        Semantics vs one big batch: identical grads except through
        BatchNorm (distill/CMM), which normalizes per microbatch — the same
        deviation torch gradient accumulation has.  batch_stats advance
        sequentially through the microbatches, like running them as
        separate steps.
        """
        a = accum_steps
        b = images_hr.shape[0]
        mb = b // a
        assert mb * a == b, f"batch {b} not divisible by accum_steps {a}"
        frozen, images_lr = self._amp_frozen_cast(state, images_lr)
        hr_m = images_hr.reshape(a, mb, *images_hr.shape[1:])
        lr_m = images_lr.reshape(a, mb, *images_lr.shape[1:])
        if microbatch_sharding is not None:
            # under a mesh: pin each microbatch's batch axis to the data
            # axis so every scan step runs data-parallel (the reshape alone
            # would leave GSPMD free to scan over per-device rows instead);
            # the one-time input reshard is ~the raw image bytes, trivial
            # next to a train step
            hr_m = jax.lax.with_sharding_constraint(hr_m, microbatch_sharding)
            lr_m = jax.lax.with_sharding_constraint(lr_m, microbatch_sharding)
        rngs = jax.random.split(rng, a)
        params = state["params"]
        g0 = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(carry, xs):
            bs, gacc, lacc = carry
            hr_i, lr_i, rng_i = xs
            loss, grads, new_bs = self._micro_grads(params, bs, frozen, hr_i, lr_i, rng_i)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            return (new_bs, gacc, lacc + loss), None

        (new_bs, gsum, lsum), _ = jax.lax.scan(
            body, (state["batch_stats"], g0, jnp.zeros((), jnp.float32)), (hr_m, lr_m, rngs)
        )
        inv = 1.0 / a
        grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
        return self._apply_update(state, grads, new_bs, lsum * inv)

    def make_accum_train_step(self, accum_steps: int, mesh=None):
        """Jitted gradient-accumulation train step (see _accum_train_step_impl).

        With a mesh, state is replicated and the batch data-sharded like
        make_parallel_trainer — accumulation composes with DP (global batch
        = n_devices * accum_steps * microbatch)."""
        import functools

        if mesh is None:
            impl = functools.partial(self._accum_train_step_impl, accum_steps=accum_steps)
            return jax.jit(impl, donate_argnums=(0,) if self.donate_state else ())
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        micro = NamedSharding(mesh, P(None, "data"))
        impl = functools.partial(
            self._accum_train_step_impl, accum_steps=accum_steps, microbatch_sharding=micro
        )
        return jax.jit(impl, in_shardings=(rep, data, data, rep), out_shardings=(rep, rep))

    def _sr_forward_impl(self, state, images_lr, glyph_from_psn: bool = False):
        """Eval-mode PSN + cascade + CMM + α-blend (super_resolution.py:385-449).
        glyph_from_psn reproduces the test() path (super_resolution.py:648)."""
        frozen = state["frozen"]
        images_lr_psn = self._psn_forward(frozen, images_lr)
        _, sr, _ = self._cascade(
            state["params"], state["batch_stats"], frozen, images_lr_psn,
            jnp.zeros_like(images_lr_psn[..., :3]), False, None,
            glyph_from_psn=glyph_from_psn,
        )
        alpha = self.args.alpha
        return alpha * sr + (1 - alpha) * images_lr_psn[..., :3]

    @staticmethod
    def bf16_state(state):
        """Cast every f32 leaf of a serving state to bfloat16 — OUTSIDE the
        jitted graph, so the compiled serving step takes bf16 arguments and
        reads half the weight bytes per dispatch.  Call once per state; the
        sr_forward_bf16 wrapper does this (and caches) automatically."""

        def to_bf16(t):
            return t.astype(jnp.bfloat16) if hasattr(t, "dtype") and t.dtype == jnp.float32 else t

        return jax.tree_util.tree_map(to_bf16, state)

    def sr_forward_bf16(self, state, images_lr, glyph_from_psn: bool = False):
        """bf16 serving forward.  The f32 state is cast host-side ONCE and
        cached (invalidated when a different state object is passed; a
        strong ref is held — serving states are long-lived).

        glyph_from_psn=True is the reference test() semantics
        (super_resolution.py:648: every student reads images_lr_psn) — it
        collapses the serial student↔PGRM dependency chain: all b1 glyph
        priors come from ONE vmapped student pass over the PSN output, so
        only the (cheap) PGRM cascade remains dependency-chained."""
        if self._bf16_src is not state:
            self._bf16_state = self.bf16_state(state)
            self._bf16_src = state
        return self._sr_forward_bf16_jit(self._bf16_state, images_lr, glyph_from_psn)

    def _sr_forward_bf16_impl(self, state16, images_lr, glyph_from_psn: bool = False):
        out = self._sr_forward_impl(state16, images_lr.astype(jnp.bfloat16), glyph_from_psn)
        return out.astype(jnp.float32)

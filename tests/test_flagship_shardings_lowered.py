"""Default-suite leash on the FLAGSHIP sharded program (VERDICT r4 #7).

tests/test_flagship_sharded_compile.py proves the flagship train step
backend-compiles on the 8-device mesh, but it is opt-in
(DPMN_RUN_COMPILE_ONLY=1, ~10-40 min) — a sharding regression would go
unnoticed between runs.  This test is the cheap always-on complement: it
traces and LOWERS the real flagship-geometry sharded train + serving steps
(embed 96, 3+3 cascade, batch 8 — the reference's DataParallel scope,
interfaces/base.py:161-162) WITHOUT backend compilation, then asserts the
sharding annotations in the emitted StableHLO:

  * the hr/lr batch arguments are sharded on the mesh 'data' axis
    (sdy.sharding [{"data"} ...]) and nothing else is,
  * the serving graph's input AND output are data-sharded,
  * the module really is the flagship program (embed-96 token tensors).

State shapes come from jax.eval_shape(init_state) — real initialization
runs ~5 min on this host and lowering only needs avals.  Runtime ~2 min
(trace + lower; no XLA backend work).
"""

import os
import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _main_signature(txt: str) -> str:
    """The @main func signature (args + results) of a lowered module."""
    start = txt.index("func.func public @main")
    # the body starts after the signature's closing '{'
    end = txt.index("{\n", start)
    return txt[start:end]


def test_flagship_shardings_in_lowered_hlo():
    from __graft_entry__ import _flagship_args
    from dpmn_tpu.config import TrainCfg
    from dpmn_tpu.parallel import make_mesh, make_parallel_trainer
    from dpmn_tpu.system import DPMNSystem

    n = 8
    assert len(jax.devices()) >= n, "needs the 8-virtual-device CPU mesh (conftest)"
    batch = n  # one image per device row
    cfg = TrainCfg(batch_size=batch, width=128, height=32)
    system = DPMNSystem(cfg, _flagship_args(), glyph_mode="atlas")
    mesh = make_mesh(n)
    train_step, sr_forward = make_parallel_trainer(system, mesh)

    state = jax.eval_shape(lambda r: system.init_state(r, batch_size=2),
                           jax.random.PRNGKey(0))
    hr = jax.ShapeDtypeStruct((batch, 32, 128, 4), jnp.float32)
    lr = jax.ShapeDtypeStruct((batch, 16, 64, 4), jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    # ---- train step: hr + lr data-sharded, state/rng/outputs replicated
    txt = train_step.lower(state, hr, lr, rng).as_text()
    sig = _main_signature(txt)
    data_args = re.findall(r'sdy\.sharding = #sdy\.sharding<@mesh, \[\{"data"\}[^>]*>', sig)
    assert len(data_args) == 2, (
        f"expected exactly the hr/lr batch args data-sharded, found {len(data_args)}"
    )
    # the flagship token tensors (16x64 grid, embed 96) must be present —
    # otherwise this leash is watching the wrong (shrunken) program
    assert re.search(r"tensor<8x1024x96xf32>", txt) or re.search(r"tensor<1024x96xf32>", txt), (
        "no embed-96 token tensors in the lowered train module"
    )

    # ---- serving graph: input and output data-sharded (students + glyph
    # atlas inside the sharded program)
    txt_eval = sr_forward.lower(state, lr, False).as_text()
    sig_eval = _main_signature(txt_eval)
    data_eval = re.findall(r'sdy\.sharding = #sdy\.sharding<@mesh, \[\{"data"\}[^>]*>', sig_eval)
    assert len(data_eval) == 2, (
        f"expected the lr arg and the sr result data-sharded, found {len(data_eval)}"
    )

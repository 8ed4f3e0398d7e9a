#!/usr/bin/env python
"""CLI for VisionLAN standalone benchmark evaluation (reference
model/VisionLAN/eval.py equivalent).

    python tools/visionlan_eval.py --roots /data/IIIT --name IIIT \
        [--ckpt visionlan.msgpack | --pth visionlan.pth] [--batch 16]

With --pth, weights come through the torch converter
(dpmn_tpu/convert_zoo.py:convert_visionlan); with --ckpt, from a flax
msgpack checkpoint; otherwise random init (smoke mode).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="+", required=True, help="scene LMDB dirs")
    ap.add_argument("--name", default="benchmark")
    ap.add_argument("--ckpt", default=None, help="flax msgpack checkpoint")
    ap.add_argument("--pth", default=None, help="torch .pth to import")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max_batches", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dpmn_tpu.models.visionlan import VisionLAN
    from dpmn_tpu.visionlan_eval import VisionLANEvaluator

    model = VisionLAN()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 256, 3)), train=False)
    if args.pth:
        from dpmn_tpu.convert import import_into, load_torch_state_dict
        from dpmn_tpu.convert_zoo import convert_visionlan

        variables = import_into(variables, convert_visionlan(load_torch_state_dict(args.pth)))
    elif args.ckpt:
        from dpmn_tpu.checkpoint import load_checkpoint

        variables, _ = load_checkpoint(args.ckpt, target=jax.device_get(variables))

    ev = VisionLANEvaluator(variables, batch_size=args.batch)
    ev.run_benchmark(args.name, args.roots, max_batches=args.max_batches)


if __name__ == "__main__":
    main()

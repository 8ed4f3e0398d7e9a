"""Input-pipeline throughput: images/sec sustained by the DataLoader at a
given worker count, on synthetic data or a real/synthetic TextZoom LMDB.

The done-criterion for the multi-worker pipeline (VERDICT r2 item 5): the
loader must sustain more img/s than the measured train step (322 img/s fp32
@ batch 64 on v5e) so the chip never starves.

  python tools/bench_loader.py --batch 64 --workers 0,4,8,16
  python tools/bench_loader.py --lmdb /path/to/textzoom --batch 64
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=str, default="0,2,4,8,16")
    ap.add_argument("--lmdb", type=str, default="")
    ap.add_argument("--n", type=int, default=2048, help="synthetic dataset size")
    ap.add_argument("--batches", type=int, default=0, help="cap measured batches")
    args = ap.parse_args()

    from dpmn_tpu.data import AlignCollate, DataLoader, SyntheticTextZoom, TextZoomLMDB

    if args.lmdb:
        ds = TextZoomLMDB(args.lmdb)
    else:
        ds = SyntheticTextZoom(n=args.n)
    col = AlignCollate(img_h=32, img_w=128, down_sample_scale=2, mask=True, train=True)

    for w in [int(x) for x in args.workers.split(",") if x != ""]:
        loader = DataLoader(ds, args.batch, col, shuffle=True, drop_last=True, workers=w)
        # warm any lazy caches, then close so leftover in-flight futures
        # from the warmup iterator don't compete with the measured epoch
        it = iter(loader)
        next(it)
        it.close()
        t0 = time.perf_counter()
        n_img = 0
        for bi, batch in enumerate(loader):
            n_img += batch[0].shape[0]
            if args.batches and bi + 1 >= args.batches:
                break
        dt = time.perf_counter() - t0
        print(f"workers={w:3d}: {n_img / dt:8.1f} img/s  ({dt:.2f}s for {n_img} images)")


if __name__ == "__main__":
    main()

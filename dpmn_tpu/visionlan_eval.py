"""VisionLAN standalone benchmark evaluation.

Parity: reference model/VisionLAN/eval.py:85-147 — evaluate a (trained or
imported) VisionLAN over scene-recognition LMDB benchmarks (the reference
runs Sum-of-6 + IIIT/IC13/IC15/SVT/SVTP/CUTE), accumulating the
Attention_AR_counter accuracy/AR/CER/WER per benchmark.  The data plane is
SceneLMDB (data/scene_dataset.py = dataset_scene.py parity) over our LMDB
reader; the model forward is the jitted fixed-25-step test path.

Usage:
    ev = VisionLANEvaluator(variables)           # flax variables
    ev.run_benchmark("IIIT", [root_lmdb_dir])
    ev.run_benchmarks({"IC13": [...], "SVT": [...]})
Or from the CLI: python tools/visionlan_eval.py --roots dir1 dir2 --name X.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.scene_dataset import SceneLMDB, scene_collate
from .models.visionlan import VisionLAN
from .utils.labels import VisionLANConverter
from .utils.text_metrics import AttentionARCounter


class VisionLANEvaluator:
    def __init__(self, variables, converter: VisionLANConverter = None,
                 case_sensitive: bool = False, batch_size: int = 16):
        self.model = VisionLAN()
        self.variables = variables
        self.converter = converter or VisionLANConverter(case_sensitive=case_sensitive)
        self.case_sensitive = case_sensitive
        self.batch_size = batch_size
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))

    def decode_batch(self, logits, lengths) -> List[str]:
        """(B, 25, C) logits + (B,) lengths → strings.  The reference
        flattens to (sum_len, C) and softmax-topks per row
        (VisionLAN/utils.py:30-41); argmax is softmax-invariant."""
        logits = np.asarray(logits)
        lengths = np.asarray(lengths).astype(np.int64)
        out = []
        for i, l in enumerate(lengths):
            ids = logits[i, : max(int(l), 0)].argmax(-1)
            out.append(self.converter.decode_ids(ids))
        return out

    def run_benchmark(self, name: str, roots: Sequence[str], img_height: int = 64,
                      img_width: int = 256, max_batches: int = None) -> Dict[str, float]:
        ds = SceneLMDB(list(roots), img_height=img_height, img_width=img_width, global_state="Test")
        counter = AttentionARCounter(f"\n{name} accuracy: ", self.case_sensitive)
        bs = self.batch_size
        n_batches = (len(ds) + bs - 1) // bs
        for bi in range(n_batches):
            if max_batches is not None and bi >= max_batches:
                break
            batch = [ds[i] for i in range(bi * bs, min((bi + 1) * bs, len(ds)))]
            images, labels, _, _, _ = scene_collate(batch)
            logits, lengths = self._fwd(self.variables, jnp.asarray(images))
            preds = self.decode_batch(logits, lengths)
            counter.add_iter(preds, labels)
        return counter.show()

    def run_benchmarks(self, benchmarks: Dict[str, Sequence[str]], **kw) -> Dict[str, Dict[str, float]]:
        """eval.py:107-147 flow: the 'Average' pass over all roots first,
        then each benchmark separately."""
        all_roots = [r for roots in benchmarks.values() for r in roots]
        results = {}
        if len(benchmarks) > 1:
            results["Average"] = self.run_benchmark("Average on benchmarks", all_roots, **kw)
        for name, roots in benchmarks.items():
            results[name] = self.run_benchmark(name, roots, **kw)
        return results

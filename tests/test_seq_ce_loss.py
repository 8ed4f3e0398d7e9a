"""SequenceCrossEntropyLoss parity vs the reference torch formulation
(model/recognizer/sequenceCrossEntropyLoss.py:36-66)."""

import numpy as np
import torch
import torch.nn.functional as F

from dpmn_tpu.losses import sequence_cross_entropy_loss


def _torch_ref(logits, target, length, sequence_normalize=False, sample_normalize=True):
    # re-statement of the reference forward on CPU (no torchsnooper dep)
    inp = torch.from_numpy(logits)
    target = torch.from_numpy(target)
    batch_size, def_max_length = target.size(0), target.size(1)
    mask = torch.zeros(batch_size, def_max_length)
    for i in range(batch_size):
        mask[i, : length[i]].fill_(1)
    max_length = max(length)
    assert max_length == inp.size(1)
    target = target[:, :max_length]
    mask = mask[:, :max_length]
    inp = F.log_softmax(inp.reshape(-1, inp.size(2)), dim=1)
    target = target.reshape(-1, 1)
    mask = mask.reshape(-1, 1)
    output = -inp.gather(1, target.long()) * mask
    output = torch.sum(output)
    if sequence_normalize:
        output = output / torch.sum(mask)
    if sample_normalize:
        output = output / batch_size
    return float(output)


def test_sequence_ce_matches_torch():
    rng = np.random.RandomState(0)
    b, t, nc = 5, 7, 11
    logits = rng.randn(b, t, nc).astype(np.float32)
    target = rng.randint(0, nc, (b, t + 3)).astype(np.int64)
    length = np.array([7, 3, 5, 1, 7])  # max must equal T (reference assert)
    ours = float(sequence_cross_entropy_loss(logits, target, length))
    ref = _torch_ref(logits, target, length)
    assert abs(ours - ref) < 1e-5, (ours, ref)


def test_sequence_ce_sequence_normalize():
    rng = np.random.RandomState(1)
    b, t, nc = 4, 6, 9
    logits = rng.randn(b, t, nc).astype(np.float32)
    target = rng.randint(0, nc, (b, t)).astype(np.int64)
    length = np.array([6, 2, 4, 6])
    ours = float(
        sequence_cross_entropy_loss(logits, target, length, sequence_normalize=True, sample_normalize=False)
    )
    ref = _torch_ref(logits, target, length, sequence_normalize=True, sample_normalize=False)
    assert abs(ours - ref) < 1e-5, (ours, ref)

"""ASTER decoder + beam-search parity vs the ACTUAL reference torch code.

Round 1 oracled only the ASTER encoder; the attention-GRU decoder and the
width-5 beam search were self-consistency tested.  This runs the real
/root/reference/model/recognizer stack (CPU torch, random weights) against
our RecognizerBuilder through convert_aster and asserts the decoded strings
match — full forward (STN+TPS+ResNet+BiLSTM+beam), teacher-forced logits,
greedy sample, and a tie-prone beam case with duplicated fc rows.

Parity target: model/recognizer/attention_recognition_head.py:68-184.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_bridge import import_reference_module

from dpmn_tpu.convert import import_into
from dpmn_tpu.convert_zoo import convert_aster
from dpmn_tpu.models.aster import RecognizerBuilder
from dpmn_tpu.utils.labels import aster_get_str_list, get_vocabulary

MAX_LEN = 40  # shorter than the reference's 100 to keep the CPU scan cheap


@pytest.fixture(scope="module")
def oracle():
    rec_mod = import_reference_module("model.recognizer")
    voc = get_vocabulary("all")
    nc = len(voc)
    eos = voc.index("EOS")

    torch.manual_seed(3)
    ref = rec_mod.RecognizerBuilder(
        arch="ResNet_ASTER", rec_num_classes=nc, sDim=512, attDim=512,
        max_len_labels=MAX_LEN, eos=eos, STN_ON=True,
    ).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    ours = RecognizerBuilder(rec_num_classes=nc, max_len_labels=MAX_LEN, eos=eos)
    variables = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 100, 3)), train=False)
    variables = import_into(variables, convert_aster(sd))
    return ref, ours, variables, nc, eos


def _images(b=3, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(b, 32, 100, 3) * 2.0 - 1.0).astype(np.float32)


def test_full_forward_beam_parity(oracle):
    """STN → TPS → encoder → beam search: decoded strings must match."""
    ref, ours, variables, nc, eos = oracle
    imgs = _images()
    b = imgs.shape[0]
    input_dict = {
        "images": torch.from_numpy(imgs).permute(0, 3, 1, 2).contiguous(),
        "rec_targets": torch.IntTensor(b, MAX_LEN).fill_(1),
        "rec_lengths": [MAX_LEN] * b,
    }
    with torch.no_grad():
        out_ref = ref(input_dict)["output"]["pred_rec"].numpy()
    out_ours = np.asarray(ours.apply(variables, jnp.asarray(imgs), train=False)["pred_rec"])

    ref_strs, _ = aster_get_str_list(out_ref, out_ref)
    our_strs, _ = aster_get_str_list(out_ours, out_ours)
    assert our_strs == ref_strs, f"beam decode mismatch: {our_strs} vs {ref_strs}"


def test_decoder_teacher_forced_and_greedy_parity(oracle):
    """Head-level: teacher-forced logits + greedy sample vs the torch head."""
    ref, ours, variables, nc, eos = oracle
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 25, 512).astype(np.float32) * 0.5
    targets = rng.randint(0, nc, size=(2, MAX_LEN)).astype(np.int32)

    with torch.no_grad():
        tf_ref = ref.decoder([torch.from_numpy(feats), torch.from_numpy(targets).long(), [MAX_LEN] * 2])
        greedy_ref, _ = ref.decoder.sample([torch.from_numpy(feats), None, None])

    head_vars = {"params": variables["params"]["decoder"]}

    def tf_apply(v, f, t):
        from dpmn_tpu.models.aster import AttentionRecognitionHead

        m = AttentionRecognitionHead(num_classes=nc, in_planes=512, max_len_labels=MAX_LEN)
        return m.apply(v, f, t)

    def greedy_apply(v, f):
        from dpmn_tpu.models.aster import AttentionRecognitionHead

        m = AttentionRecognitionHead(num_classes=nc, in_planes=512, max_len_labels=MAX_LEN)
        return m.apply(v, f, method=m.sample)

    tf_ours = tf_apply(head_vars, jnp.asarray(feats), jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(tf_ours), tf_ref.numpy(), rtol=2e-3, atol=2e-3)

    greedy_ours, _ = greedy_apply(head_vars, jnp.asarray(feats))
    np.testing.assert_array_equal(np.asarray(greedy_ours), greedy_ref.numpy())


def test_beam_search_tie_prone(oracle):
    """Duplicate two fc rows so two classes always score EXACTLY equal —
    the candidate ranking must still backtrack to the same decoded string
    (both torch.topk and lax.top_k prefer the lower index on ties)."""
    ref, ours, variables, nc, eos = oracle
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 25, 512).astype(np.float32) * 0.5

    tie_a, tie_b = 5, 11  # arbitrary non-EOS classes
    with torch.no_grad():
        ref.decoder.decoder.fc.weight[tie_b] = ref.decoder.decoder.fc.weight[tie_a]
        ref.decoder.decoder.fc.bias[tie_b] = ref.decoder.decoder.fc.bias[tie_a]
        ids_ref, _ = ref.decoder.beam_search(torch.from_numpy(feats), 5, eos)

    p = dict(variables["params"]["decoder"])
    fck = np.array(p["fc_kernel"])
    fcb = np.array(p["fc_bias"])
    fck[:, tie_b] = fck[:, tie_a]
    fcb[tie_b] = fcb[tie_a]
    p["fc_kernel"], p["fc_bias"] = jnp.asarray(fck), jnp.asarray(fcb)

    from dpmn_tpu.models.aster import AttentionRecognitionHead

    m = AttentionRecognitionHead(num_classes=nc, in_planes=512, max_len_labels=MAX_LEN)
    ids_ours, _ = m.apply({"params": p}, jnp.asarray(feats), 5, eos, method=m.beam_search)

    ref_strs, _ = aster_get_str_list(ids_ref.numpy(), ids_ref.numpy())
    our_strs, _ = aster_get_str_list(np.asarray(ids_ours), np.asarray(ids_ours))
    assert our_strs == ref_strs, f"tie-case decode mismatch: {our_strs} vs {ref_strs}"


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_beam_search_many_eos_replacement_semantics(oracle, seed):
    """Boost the EOS bias so many beams end at staggered times (>k EOS
    events).  The reference's backward replacement keeps only the k
    EARLIEST-ending events (last-write-wins over slots,
    attention_recognition_head.py:146-168) — NOT the global max-score EOS
    event — so this distinguishes the exact backtracking from the round-1/2
    max-score approximation."""
    ref, ours, variables, nc, eos = oracle
    rng = np.random.RandomState(seed)
    feats = rng.randn(3, 25, 512).astype(np.float32) * 0.5

    boost = 1.5
    with torch.no_grad():
        fc_b = ref.decoder.decoder.fc.bias.clone()
        ref.decoder.decoder.fc.bias[eos] += boost
        ids_ref, _ = ref.decoder.beam_search(torch.from_numpy(feats), 5, eos)
        ref.decoder.decoder.fc.bias.copy_(fc_b)  # restore for other tests

    p = dict(variables["params"]["decoder"])
    fcb = np.array(p["fc_bias"])
    fcb[eos] += boost
    p = {**p, "fc_bias": jnp.asarray(fcb)}

    from dpmn_tpu.models.aster import AttentionRecognitionHead

    m = AttentionRecognitionHead(num_classes=nc, in_planes=512, max_len_labels=MAX_LEN)
    ids_ours, _ = m.apply({"params": p}, jnp.asarray(feats), 5, eos, method=m.beam_search)

    ref_strs, _ = aster_get_str_list(ids_ref.numpy(), ids_ref.numpy())
    our_strs, _ = aster_get_str_list(np.asarray(ids_ours), np.asarray(ids_ours))
    assert our_strs == ref_strs, f"many-EOS decode mismatch: {our_strs} vs {ref_strs}"

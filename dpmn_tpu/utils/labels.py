"""Vocabularies and label codecs.

Behavioral parity targets in the reference:
  * get_vocabulary / char2id / id2char      — utils/labelmaps.py:6-37
  * str_filt                                — utils/util.py:60-72
  * CTC codec (CRNN)                        — utils/utils_crnn.py:10-91 and
                                              utils/util.py:75-153
  * attention codec (MORAN)                 — utils/utils_moran.py:6-107
  * VisionLAN dict codec                    — model/VisionLAN/utils.py:10-41
  * ASTER decode (get_str_list)             — utils/metrics.py:15-68

All codecs here are plain Python/numpy: they run on the host at the string
boundary.  Everything inside jit works on integer id tensors only.
"""

from __future__ import annotations

import string

import numpy as np

ALPHA_DICT = {
    "digit": string.digits,
    "lower": string.digits + string.ascii_lowercase,
    "upper": string.digits + string.ascii_letters,
    "all": string.digits + string.ascii_letters + string.punctuation,
}

# the VisionLAN dict-file charset, IN FILE ORDER: a-z then 1..9 then 0
# (reference dic_36.txt; digits are NOT in natural order — id 27 is '1',
# id 36 is '0').  Round-2 fix: the previous a-z0-9 ordering shifted every
# digit decode by one (caught by tests/test_visionlan_eval.py).
DIC_36 = list(string.ascii_lowercase + "1234567890")


def get_vocabulary(voc_type, EOS="EOS", PADDING="PADDING", UNKNOWN="UNKNOWN"):
    """Char vocabulary + specials, order-compatible with labelmaps.py:6-28."""
    if voc_type not in ALPHA_DICT:
        raise KeyError("voc_type Error")
    voc = list(ALPHA_DICT[voc_type])
    voc.append(EOS)
    voc.append(PADDING)
    voc.append(UNKNOWN)
    return voc


def char2id(voc):
    return dict(zip(voc, range(len(voc))))


def id2char(voc):
    return dict(zip(range(len(voc)), voc))


def str_filt(str_, voc_type):
    """Drop chars outside the vocabulary; lower-cases for 'lower'.

    Parity: utils/util.py:60-72.
    """
    if voc_type == "lower":
        str_ = str_.lower()
    allowed = ALPHA_DICT[voc_type]
    for char in str_:
        if char not in allowed:
            str_ = str_.replace(char, "")
    return str_


def normalize_text(text):
    """ASTER metric normalization (utils/metrics.py:15-17)."""
    text = "".join(filter(lambda x: x in (string.digits + string.ascii_letters), text))
    return text.lower()


class CTCLabelConverter:
    """CTC codec used by the CRNN recognizer.

    Index 0 is blank; chars map to 1..len(alphabet).
    Parity: utils/utils_crnn.py / utils/util.py:75-153.
    """

    def __init__(self, alphabet=string.digits + string.ascii_lowercase):
        self.alphabet = alphabet + "-"  # '-' display char for the blank/-1 slot
        self.dict = {c: i + 1 for i, c in enumerate(alphabet)}

    def encode(self, texts):
        if isinstance(texts, str):
            texts = [texts]
        flat = [self.dict[c] for t in texts for c in t]
        lengths = [len(t) for t in texts]
        return np.asarray(flat, np.int32), np.asarray(lengths, np.int32)

    def decode_single(self, ids, raw=False):
        ids = list(np.asarray(ids).reshape(-1))
        if raw:
            return "".join(self.alphabet[i - 1] for i in ids)
        chars = []
        for i, t in enumerate(ids):
            if t != 0 and not (i > 0 and ids[i - 1] == t):
                chars.append(self.alphabet[t - 1])
        return "".join(chars)

    def decode(self, ids, lengths, raw=False):
        """ids: flat concatenated int array; lengths: per-sample lengths."""
        ids = np.asarray(ids).reshape(-1)
        out, idx = [], 0
        for l in np.asarray(lengths).reshape(-1):
            out.append(self.decode_single(ids[idx : idx + int(l)], raw=raw))
            idx += int(l)
        return out

    def decode_logits(self, logits):
        """Greedy CTC decode of (T, B, n_class) logits → list of strings.

        Mirrors the reference eval path (interfaces/super_resolution.py:476-489):
        argmax over classes, collapse repeats, drop blanks.
        """
        logits = np.asarray(logits)
        preds = logits.argmax(-1)  # (T, B)
        return [self.decode_single(preds[:, b]) for b in range(preds.shape[1])]


class AttentionLabelConverter:
    """MORAN attention codec: alphabet '0:1:...:z:$', '$' is the stop char.

    Parity: utils/utils_moran.py:6-107.
    """

    def __init__(self, alphabet=":".join(string.digits + string.ascii_lowercase + "$"), sep=":"):
        self.alphabet = alphabet.split(sep)
        self.dict = {item: i for i, item in enumerate(self.alphabet)}

    def encode(self, texts):
        if isinstance(texts, str):
            texts = [texts]
        flat = [self.dict[c.lower()] for t in texts for c in t]
        lengths = [len(t) for t in texts]
        return np.asarray(flat, np.int64), np.asarray(lengths, np.int64)

    def decode(self, ids, lengths):
        ids = np.asarray(ids).reshape(-1)
        lengths = np.asarray(lengths).reshape(-1)
        out, idx = [], 0
        for l in lengths:
            out.append("".join(self.alphabet[i] for i in ids[idx : idx + int(l)]))
            idx += int(l)
        return out if len(out) > 1 else out[0] if out else ""


class VisionLANConverter:
    """VisionLAN dict codec (model/VisionLAN/utils.py:10-41).

    encode: char → dict-index + 1 (0 is the pad/stop slot).
    decode: per-sample argmax ids back to a string, '' for out-of-range.
    convert: pad per-sample prob tensor to (1, 25, n_class) as in
    Attention_AR_counter.convert (model/VisionLAN/utils.py:110-119).
    """

    MAX_LEN = 25

    def __init__(self, charset=None, case_sensitive=False):
        self.dict = list(charset) if charset is not None else list(DIC_36)
        self.case_sensitive = case_sensitive

    @property
    def num_classes(self):
        return len(self.dict) + 1

    def encode(self, labels):
        max_len = max(len(s) for s in labels)
        out = np.zeros((len(labels), max_len + 1), np.int64)
        for i, s in enumerate(labels):
            chars = s if self.case_sensitive else s.lower()
            enc = [self.dict.index(c) + 1 if c in self.dict else len(self.dict) + 1 for c in chars]
            out[i, : len(enc)] = enc
        return out

    def decode_ids(self, ids):
        return "".join(self.dict[i - 1] if 0 < i <= len(self.dict) else "" for i in ids)

    def decode_probs(self, probs, length):
        """probs: (sum_lengths, n_class) softmax output; length: per-sample."""
        probs = np.asarray(probs)
        length = np.asarray(length).reshape(-1)
        out, idx = [], 0
        for l in length:
            ids = probs[idx : idx + int(l)].argmax(-1)
            out.append(self.decode_ids(ids))
            idx += int(l)
        return out

    def convert(self, output, out_length):
        """Raw net output → (strings, (1, 25, n_class) prob tensor)."""
        output = np.asarray(output, np.float32)
        exp = np.exp(output - output.max(-1, keepdims=True))
        probs = exp / exp.sum(-1, keepdims=True)
        texts = self.decode_probs(probs, out_length)
        probs = probs[None]  # (1, T, C)
        t = probs.shape[1]
        if t >= self.MAX_LEN:
            return texts, probs[:, : self.MAX_LEN, :]
        pad = np.zeros((1, self.MAX_LEN - t, probs.shape[2]), np.float32)
        return texts, np.concatenate([probs, pad], axis=1)


def aster_get_str_list(output_ids, target_ids, voc_type="all"):
    """Decode ASTER id sequences to normalized strings.

    Parity: utils/metrics.py:20-68 (stop at EOS, skip UNKNOWN, normalize).
    """
    voc = get_vocabulary(voc_type)
    c2i, i2c = char2id(voc), id2char(voc)
    end_label, unknown_label = c2i["EOS"], c2i["UNKNOWN"]
    output_ids = np.asarray(output_ids)
    target_ids = np.asarray(target_ids)

    def dec(mat):
        res = []
        for row in mat:
            chars = []
            for j in row:
                if j == end_label:
                    break
                if j != unknown_label:
                    chars.append(i2c[int(j)])
            res.append(normalize_text("".join(chars)))
        return res

    return dec(output_ids), dec(target_ids)

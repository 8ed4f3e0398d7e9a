"""Driver weight wiring: pretrained artifacts → the live train-state pytree.

This is the production half of the reference driver's weight loading, which
rounds 1-2 left unwired (the converters existed but nothing called them from
the Trainer/CLI).  Parity targets:

  * interfaces/base.py:163-197   — --resume dir loads: PSN from
    model_{arch}.pth (state_dict_G), test-time PGRM i from
    model_best_{i}.pth; a file resume loads its state_dict_G directly
  * interfaces/base.py:375-439   — ASTER (rec_pretrained, 'state_dict' key),
    MORAN (moran_pretrained, 'module.' strip), CRNN (crnn_pretrained, raw
    state_dict) evaluator checkpoints
  * interfaces/base.py:452-471   — VisionLAN students initialized from the
    pretrained LA model (cfgs init_state_dict ⇒ cfg.visionlan_pretrained)
  * interfaces/super_resolution.py:93-97,550-554 — crnn_psn from
    os.path.join(resume, 'recognizer_best_crnn.pth')
  * interfaces/super_resolution.py:100-111,528-543 — per-iteration students
    from os.path.join(rec_path, 'recognizer_best_{i}.pth'[.tar])
  * interfaces/super_resolution.py:556-586 — test-time model_best_{i}.pth +
    model_best_cmm.pth

Native checkpoints: alongside the torch formats, any '*.msgpack' path is
treated as a full-state flax checkpoint (checkpoint.py) — this is the
round-trip format the Trainer itself writes.
"""

from __future__ import annotations

import os
from typing import Any, Dict

from .convert import convert_crnn, convert_tsrn, import_into, load_torch_state_dict
from .convert_psn import convert_tatt, convert_tbsrn, convert_tsrn_tl
from .convert_zoo import (
    convert_aster,
    convert_cmm,
    convert_moran,
    convert_pgrm,
    convert_visionlan,
)

TORCH_SUFFIXES = (".pth", ".pth.tar", ".pt", ".tar")


def _say(msg: str) -> None:
    print(f"[weights] {msg}", flush=True)


def convert_psn_state_dict(arch: str, sd: Dict[str, Any], srb_nums: int, stn: bool = False):
    """Dispatch a PSN torch state dict to its converter (base.py:127-149).

    stn=False is correct for the frozen driver PSN: both the reference and
    the flax models apply the TPS-STN front end only in training mode, and
    the driver's PSN runs eval-mode forever (model_psn.eval(),
    super_resolution.py:57-59) — its flax tree therefore has no STN subtree
    and any stn_head.* checkpoint keys are dead weight."""
    if arch in ("tsrn", "tg"):
        return convert_tsrn(sd, srb_nums=srb_nums, stn=stn)
    if arch == "tpgsr":
        return convert_tsrn_tl(sd, srb_nums=srb_nums, stn=stn)
    if arch == "tbsrn":
        return convert_tbsrn(sd, srb_nums=srb_nums, stn=stn)
    if arch == "tatt":
        return convert_tatt(sd, srb_nums=srb_nums, stn=stn)
    raise ValueError(f"no PSN converter for arch={arch!r}")


def convert_student_state_dict(tpg: str, sd: Dict[str, Any]):
    """Dispatch a student-TPG torch state dict (super_resolution.py:27-31
    TP_Generator_dict).  The DPMN glyph branch consumes VisionLAN outputs
    (parse_visionlan_data + AR-counter convert, :177-193), so visionlan is
    the only TPG the cascade can actually run with — same constraint as the
    reference."""
    if tpg == "visionlan":
        # the frozen eval-path student tree has no MLM branch (train=False)
        return convert_visionlan(sd, mlm=False)
    raise ValueError(
        f"tpg={tpg!r}: the DPMN cascade's glyph branch requires visionlan "
        "students (reference super_resolution.py:177-193 hardcodes the "
        "VisionLAN parse/convert flow)"
    )


def _student_path(rec_path: str, k: int, tpg: str) -> str:
    """recognizer_best_{k}.pth / .pth.tar (super_resolution.py:528-535)."""
    base = os.path.join(rec_path, f"recognizer_best_{k}")
    return base + (".pth.tar" if tpg == "aster" else ".pth")


def _merge_module(state, name: str, converted) -> None:
    """Import a {'params','batch_stats'} converted tree into the trainable
    module `name` of the state pytree, in place."""
    fake = {"params": state["params"][name]}
    if state["batch_stats"].get(name):
        fake["batch_stats"] = state["batch_stats"][name]
    merged = import_into(fake, converted)
    state["params"][name] = merged["params"]
    if "batch_stats" in merged and merged["batch_stats"]:
        state["batch_stats"][name] = merged["batch_stats"]


def load_driver_weights(system, state, cfg, args, testing: bool = False):
    """Fill a freshly-initialized DPMNSystem state with every pretrained
    torch artifact the config names.  Returns the (mutated-copy) state.

    Train-time (testing=False): PSN from the resume dir, crnn_psn, students.
    Test-time  (testing=True):  additionally PGRMs + CMM from model_best_*.
    Missing optional artifacts are skipped with a message (the reference
    crashes instead; a soft skip keeps synthetic/CI runs weight-free).
    """
    state = {
        "params": dict(state["params"]),
        "batch_stats": dict(state["batch_stats"]),
        "frozen": dict(state["frozen"]),
        "opt_state": state["opt_state"],
        "step": state["step"],
    }
    resume = args.resume or cfg.resume or ""
    resume_dir = resume if os.path.isdir(resume) else ""

    # ---- frozen PSN (base.py:163-197: model_{arch}.pth in the resume dir,
    # or the resume file itself when it is a torch checkpoint)
    psn_path = ""
    if resume_dir:
        cand = os.path.join(resume_dir, f"model_{args.arch}.pth")
        if os.path.exists(cand):
            psn_path = cand
    elif resume.endswith(TORCH_SUFFIXES) and os.path.isfile(resume) and not testing:
        # deliberate deviation: the reference would ALSO load a test-time
        # file resume (a PGRM state_dict_G) into the PSN (base.py:163-197,
        # guard `psn or testing`) — broken for mismatched archs; we load the
        # file into the PGRMs only.  See PARITY.md "Known parity deviations".
        psn_path = resume
    if psn_path:
        sd = load_torch_state_dict(psn_path)
        state["frozen"]["psn"] = import_into(
            state["frozen"]["psn"], convert_psn_state_dict(args.arch, sd, args.srb)
        )
        _say(f"PSN ({args.arch}) loaded from {psn_path}")

    # ---- crnn_psn text-prior generator (super_resolution.py:93-97,550-554)
    if system.crnn_psn is not None and resume_dir:
        cand = os.path.join(resume_dir, "recognizer_best_crnn.pth")
        if os.path.exists(cand):
            sd = load_torch_state_dict(cand)
            state["frozen"]["crnn_psn"] = import_into(state["frozen"]["crnn_psn"], convert_crnn(sd))
            _say(f"crnn_psn loaded from {cand}")
        else:
            _say(f"crnn_psn artifact missing ({cand}); keeping random init")

    # ---- student TPGs (super_resolution.py:100-111,528-543 from rec_path;
    # base.py:452-471 fallback: every student from the pretrained LA model)
    if args.rec_path:
        for k in range(system.b1):
            path = _student_path(args.rec_path, k, args.tpg)
            sd = load_torch_state_dict(path)
            state["frozen"][f"student_{k}"] = import_into(
                state["frozen"][f"student_{k}"], convert_student_state_dict(args.tpg, sd)
            )
            _say(f"student_{k} ({args.tpg}) loaded from {path}")
    elif cfg.visionlan_pretrained and os.path.exists(cfg.visionlan_pretrained):
        sd = load_torch_state_dict(cfg.visionlan_pretrained)
        converted = convert_student_state_dict("visionlan", sd)
        for k in range(system.b1):
            state["frozen"][f"student_{k}"] = import_into(state["frozen"][f"student_{k}"], converted)
        _say(f"all {system.b1} students initialized from {cfg.visionlan_pretrained}")

    # ---- test-time SR weights (super_resolution.py:556-586, base.py:163-197)
    if testing and resume:
        if resume_dir:
            for i in range(system.n_pgrm):
                cand = os.path.join(resume_dir, f"model_best_{i}.pth")
                if not os.path.exists(cand):
                    _say(f"PGRM artifact missing ({cand}); keeping current weights")
                    continue
                sd = load_torch_state_dict(cand)
                m = system.pgrms[i]
                _merge_module(
                    state, f"pgrm_{i}",
                    convert_pgrm(sd, num_layers=m.num_layers, window_num=args.window_num,
                                 graphic_mode=m.graphic_mode),
                )
                _say(f"pgrm_{i} loaded from {cand}")
            cand = os.path.join(resume_dir, "model_best_cmm.pth")
            if os.path.exists(cand):
                _merge_module(state, "cmm", convert_cmm(load_torch_state_dict(cand)))
                _say(f"cmm loaded from {cand}")
            else:
                _say(f"cmm artifact missing ({cand}); keeping current weights")
        elif resume.endswith(TORCH_SUFFIXES) and os.path.isfile(resume):
            # file resume at test time: the reference loads the same
            # state_dict_G into every PGRM (base.py:180-181,196-197)
            sd = load_torch_state_dict(resume)
            for i in range(system.n_pgrm):
                m = system.pgrms[i]
                _merge_module(
                    state, f"pgrm_{i}",
                    convert_pgrm(sd, num_layers=m.num_layers, window_num=args.window_num,
                                 graphic_mode=m.graphic_mode),
                )
            _say(f"all PGRMs loaded from {resume}")
    return state


def resolve_native_checkpoint(resume: str, testing: bool = False) -> str:
    """Map a --resume value to a full-state msgpack checkpoint if one exists.

    A file path is returned as-is when it is a msgpack; a directory is
    searched in preference order — at test time the best-tracked state wins
    (the reference's model_best_* naming, base.py:176-181), otherwise the
    rolling checkpoint (resume-training semantics).
    """
    if not resume:
        return ""
    if os.path.isfile(resume):
        return resume if resume.endswith(".msgpack") else ""
    if not os.path.isdir(resume):
        return ""
    names = ["model_best_sum.msgpack", "checkpoint.msgpack"] if testing else [
        "checkpoint.msgpack", "model_best_sum.msgpack"]
    for name in names:
        cand = os.path.join(resume, name)
        if os.path.exists(cand):
            return cand
    return ""


def evaluator_pretrained_path(rec: str, cfg) -> str:
    """The VAL-config checkpoint for the --rec evaluator (base.py:375-439)."""
    return {
        "aster": cfg.rec_pretrained,
        "moran": cfg.moran_pretrained,
        "crnn": cfg.crnn_pretrained,
    }.get(rec, "") or ""


def convert_evaluator_state_dict(rec: str, sd: Dict[str, Any]):
    if rec == "aster":
        return convert_aster(sd)
    if rec == "moran":
        return convert_moran(sd)
    if rec == "crnn":
        return convert_crnn(sd)
    raise ValueError(rec)

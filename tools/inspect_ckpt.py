"""Diff a real checkpoint's safetensors key listing against the loader's
expectation — the day-one diagnostic for real weights (VERDICT r2 item 6a).

The loader's raw key map was reconstructed from the reference's remapper
(Qwen3.swift:1498-1750) without a real checkpoint to verify against; a
wrong prefix would make ``from_pretrained`` fail opaquely. This tool turns
that into an actionable report: for the checkpoint's OWN config it
generates the complete expected key->shape listing (tests/synthetic_ckpt.py
builds raw-format names from any config dict) and diffs it against the
actual safetensors headers — parsed directly, no tensor data is loaded.

Usage:
  python tools/inspect_ckpt.py <model_dir>          # report + exit status
  python tools/inspect_ckpt.py <model_dir> --keys   # also dump both listings

Exit 0: key sets match (shape mismatches are warnings). Exit 1: missing or
unexpected keys.
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.join(__file__.rsplit("/", 2)[0], "tests"))


def read_safetensors_header(path: str) -> dict[str, tuple[str, tuple[int, ...]]]:
    """name -> (dtype, shape) from the file header; tensor data untouched."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    return {
        k: (v["dtype"], tuple(v["shape"]))
        for k, v in header.items()
        if k != "__metadata__"
    }


def actual_listing(model_dir: str) -> dict[str, tuple[str, tuple[int, ...]]]:
    out = {}
    for f in sorted(os.listdir(model_dir)):
        if f.endswith(".safetensors"):
            out.update(read_safetensors_header(os.path.join(model_dir, f)))
    return out


def expected_listing(model_dir: str) -> dict[str, tuple[int, ...]]:
    """Expected main-checkpoint keys+shapes for this config, no allocation."""
    import synthetic_ckpt as sc

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)

    # broadcast views instead of real arrays: name/shape only, zero copies
    orig_mat, orig_randn = sc._mat, None

    def fake_mat(name, *shape, scale=None):
        return np.broadcast_to(np.float32(0), shape)

    sc._mat = fake_mat
    try:
        w = sc.build_main_weights(cfg)
    finally:
        sc._mat = orig_mat
    if cfg.get("quantization"):
        q = cfg["quantization"]
        w = quantized_names(w, bits=q.get("bits", 4), group=q.get("group_size", 32))
    return {k: tuple(v.shape) for k, v in w.items()}


def quantized_names(w: dict, bits: int, group: int) -> dict:
    """Apply quantize_weights_mlx's NAME transform without quantizing."""
    out = {}
    for k, v in w.items():
        is_linear = (
            k.endswith(".weight")
            and v.ndim == 2
            and ("proj" in k or "lm_head" in k or "codec_head" in k or "linear_fc" in k)
            and "embedding" not in k
            and v.shape[1] % group == 0
        )
        if is_linear:
            o, i = v.shape
            per_word = 32 // bits
            out[k] = np.broadcast_to(np.uint32(0), (o, i // per_word))
            out[k + ".scales"] = np.broadcast_to(np.float32(0), (o, i // group))
            out[k + ".biases"] = np.broadcast_to(np.float32(0), (o, i // group))
        else:
            out[k] = v
    return out


def expected_st_listing(st_dir: str) -> dict[str, tuple[int, ...]]:
    import synthetic_ckpt as sc

    with open(os.path.join(st_dir, "config.json")) as f:
        st_cfg = json.load(f)
    orig = sc._mat
    sc._mat = lambda name, *shape, scale=None: np.broadcast_to(np.float32(0), shape)
    try:
        w = sc.build_speech_tokenizer_weights(st_cfg)
    finally:
        sc._mat = orig
    return {k: tuple(v.shape) for k, v in w.items()}


def diff(tag: str, expected: dict, actual: dict, show_keys: bool) -> int:
    exp_keys, act_keys = set(expected), set(actual)
    missing = sorted(exp_keys - act_keys)
    unexpected = sorted(act_keys - exp_keys)
    mismatched = sorted(
        k for k in exp_keys & act_keys if tuple(expected[k]) != tuple(actual[k][1])
    )
    print(f"== {tag}: {len(act_keys)} on disk, {len(exp_keys)} expected")
    for k in missing:
        print(f"  MISSING    {k}  (loader expects shape {expected[k]})")
    for k in unexpected:
        print(f"  UNEXPECTED {k}  {actual[k][1]} {actual[k][0]}")
    for k in mismatched:
        print(f"  SHAPE      {k}: disk {actual[k][1]} vs expected {expected[k]}")
    if not (missing or unexpected or mismatched):
        print("  OK: key sets and shapes match")
    if show_keys:
        for k in sorted(exp_keys | act_keys):
            mark = " " if k in exp_keys and k in act_keys else ("-" if k in exp_keys else "+")
            print(f"  {mark} {k}")
    return len(missing) + len(unexpected)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    show_keys = "--keys" in argv
    args = [a for a in argv if not a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    model_dir = args[0]
    bad = diff(
        "main checkpoint", expected_listing(model_dir), actual_listing(model_dir),
        show_keys,
    )
    st_dir = os.path.join(model_dir, "speech_tokenizer")
    if os.path.isdir(st_dir):
        bad += diff(
            "speech_tokenizer", expected_st_listing(st_dir), actual_listing(st_dir),
            show_keys,
        )
    else:
        print("== speech_tokenizer/: absent (vocoder/encoder will not load)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

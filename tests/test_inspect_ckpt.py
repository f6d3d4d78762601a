"""tools/inspect_ckpt.py: the real-checkpoint key-diff diagnostic.

A green run on the synthetic checkpoint proves the expected listing matches
what the loader round-trips; the mutation cases prove a real checkpoint
with a renamed/missing/extra key produces an actionable report instead of
an opaque load failure (VERDICT r2 item 6a).
"""

import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _run(model_dir):
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "inspect_ckpt.py"), model_dir],
        capture_output=True,
        text=True,
    )
    return r.returncode, r.stdout


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from synthetic_ckpt import write_checkpoint

    d = tmp_path_factory.mktemp("ckpt")
    return write_checkpoint(str(d))


def test_clean_checkpoint_passes(ckpt):
    rc, out = _run(ckpt)
    assert rc == 0, out
    assert out.count("OK: key sets and shapes match") == 2


def test_detects_missing_and_unexpected(ckpt, tmp_path):
    from safetensors.numpy import load_file, save_file

    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(ckpt, broken)
    p = str(broken / "model.safetensors")
    w = load_file(p)
    # simulate a wrong-prefix reconstruction: rename one key, drop another
    w["talker.model.wrong_prefix.norm.weight"] = w.pop("talker.model.norm.weight")
    w.pop("talker.codec_head.weight")
    save_file(w, p)
    rc, out = _run(str(broken))
    assert rc == 1
    assert "MISSING    talker.model.norm.weight" in out
    assert "MISSING    talker.codec_head.weight" in out
    assert "UNEXPECTED talker.model.wrong_prefix.norm.weight" in out

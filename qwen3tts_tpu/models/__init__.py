from . import code_predictor, generate, talker, vocoder

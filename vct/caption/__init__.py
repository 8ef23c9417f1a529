from vct.caption.beam import beam_search, decode_tokens, greedy_decode  # noqa: F401
from vct.caption.bleu import corpus_average_bleu, sentence_bleu  # noqa: F401
from vct.caption.data import (  # noqa: F401
    encode_caption,
    extract_frames_interval,
    load_caption_dataset,
    preprocess_annotations,
)
from vct.caption.models import S2VTModel  # noqa: F401
from vct.caption.train import CaptionState, CaptionTrainer  # noqa: F401
from vct.caption.vocab import Vocabulary, tokenize_caption  # noqa: F401

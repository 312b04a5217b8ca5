"""Tokenization: from-scratch SentencePiece runtime + the unified vocabulary.

The reference (data_utils/sp_tokenizer.py:98-127) wraps Google's C++
``sentencepiece`` library around ``pretrained/chinese_sentencepiece/
cog-pretrain.model`` (a BPE model, model_type=2, with nmt_nfkc
normalization).  That library is not part of this framework's environment,
so the runtime is implemented from scratch here against the same ``.model``
proto: wire-format parsing (:mod:`spm_proto`), the precompiled-charsmap
normalizer (:mod:`normalizer`), and agenda-based BPE segmentation
(:mod:`bpe`).  Ids are bit-compatible by construction: piece ids are the
proto's piece order and merges replay the recorded ranks.
"""

from .text_tokenizer import TextTokenizer, from_pretrained
from .unified import UnifiedTokenizer, FakeImageTokenizer, get_tokenizer

__all__ = [
    "TextTokenizer",
    "from_pretrained",
    "UnifiedTokenizer",
    "FakeImageTokenizer",
    "get_tokenizer",
]

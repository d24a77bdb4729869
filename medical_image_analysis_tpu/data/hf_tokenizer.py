"""HF fast-tokenizer bridge (the reference's Llama/Qwen tokenizers).

The reference tokenizes prompts/reports with HF ``AutoTokenizer``
(``/root/reference/R2GenCSR/models/R2GenCSR.py:140-158``: Llama-2
tokenizer with ``add_special_tokens=False``, pad = eos). This module
adapts any HF *fast* tokenizer (``tokenizer.json``, loaded through the
``tokenizers`` runtime — no network needed) to the framework's
Tokenizer interface (encode/decode + PAD/BOS/EOS ids), so recipes and
serving run unchanged with real-model vocabularies.

For fully offline runs it can also *train* a byte-level BPE on the
report corpus (``HFTokenizer.train_bpe``) — a real subword tokenizer of
any target vocab size, exercised by the tests.
"""

from __future__ import annotations

from typing import Iterable


def _require_tokenizers():
    try:
        import tokenizers  # noqa: F401

        return tokenizers
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "the `tokenizers` package is required for HFTokenizer"
        ) from e


class HFTokenizer:
    """Wraps ``tokenizers.Tokenizer`` behind the framework interface."""

    def __init__(self, tok, bos: str = "<s>", eos: str = "</s>",
                 pad: str | None = None, unk: str = "<unk>"):
        self._tok = tok
        self.BOS = tok.token_to_id(bos) if tok.token_to_id(bos) is not None else 1
        self.EOS = tok.token_to_id(eos) if tok.token_to_id(eos) is not None else 2
        # Llama convention: no pad token; the reference sets pad = eos
        # (R2GenCSR.py:157). Honor an explicit pad token when present.
        pad_id = tok.token_to_id(pad) if pad else None
        self.PAD = pad_id if pad_id is not None else self.EOS
        unk_id = tok.token_to_id(unk)
        self.UNK = unk_id if unk_id is not None else 0

    # construction ---------------------------------------------------------

    @classmethod
    def from_file(cls, path: str, **kw) -> "HFTokenizer":
        """Load an HF ``tokenizer.json`` (Llama-2, Qwen1.5, ...)."""
        tokenizers = _require_tokenizers()
        return cls(tokenizers.Tokenizer.from_file(path), **kw)

    @classmethod
    def train_bpe(
        cls, texts: Iterable[str], vocab_size: int = 8192
    ) -> "HFTokenizer":
        """Train a byte-level BPE on the corpus (offline 'real' subword
        tokenizer; same runtime class as a loaded Llama tokenizer)."""
        tokenizers = _require_tokenizers()
        from tokenizers import Tokenizer, decoders, models, pre_tokenizers
        from tokenizers.trainers import BpeTrainer

        tok = Tokenizer(models.BPE(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
        tok.decoder = decoders.ByteLevel()
        trainer = BpeTrainer(
            vocab_size=vocab_size,
            special_tokens=["<unk>", "<s>", "</s>"],
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        )
        tok.train_from_iterator(texts, trainer)
        return cls(tok)

    # interface ------------------------------------------------------------

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    def encode(self, text: str, max_len: int | None = None,
               add_bos: bool = False, add_eos: bool = False) -> list[int]:
        ids = self._tok.encode(text, add_special_tokens=False).ids
        if add_bos:
            ids = [self.BOS] + ids
        if add_eos:
            ids = ids + [self.EOS]
        if max_len is not None:
            ids = ids[:max_len]
        return ids

    def pad(self, ids: list[int], max_len: int) -> tuple[list[int], list[int]]:
        mask = [1] * len(ids) + [0] * (max_len - len(ids))
        return ids + [self.PAD] * (max_len - len(ids)), mask

    def decode(self, ids: Iterable[int]) -> str:
        keep = []
        for i in ids:
            i = int(i)
            if i == self.EOS:
                break
            if i == self.BOS or (i == self.PAD and self.PAD != self.EOS):
                continue
            keep.append(i)
        return self._tok.decode(keep).strip()

    def save(self, path: str):
        self._tok.save(path)

    @classmethod
    def load(cls, path: str) -> "HFTokenizer":
        return cls.from_file(path)

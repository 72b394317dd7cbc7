"""Tokenizers for ingest-time token/box alignment.

The reference tokenizes per word inside the model's forward pass
(src/VT5.py:155-164) with a SentencePiece T5 tokenizer. We tokenize once at
ingest. Three backends:

  * ``HFTokenizer``   — wraps a locally available HuggingFace tokenizer
                        (T5/SentencePiece), for real-checkpoint runs.
  * ``HashTokenizer`` — deterministic hash-based subword ids in a T5-sized
                        vocab; used for benchmarking at realistic vocab size
                        without network access to SentencePiece models.
  * ``ByteTokenizer`` — exact-roundtrip byte-level tokenizer; used by tests
                        that need decode(encode(x)) == x.

All expose the same tiny interface: `encode_word`, `encode`, `decode`,
`vocab_size`, `pad_id`, `eos_id`, `unk_id`.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Sequence


class BaseTokenizer:
    vocab_size: int
    pad_id: int = 0
    eos_id: int = 1
    unk_id: int = 2

    #: first id available for content tokens
    _first_content_id: int = 3

    def encode_word(self, word: str) -> List[int]:
        raise NotImplementedError

    def encode(self, text: str) -> List[int]:
        """Encode a whitespace-separated string (no EOS appended)."""
        out: List[int] = []
        for w in text.split():
            out.extend(self.encode_word(w))
        return out

    def decode(self, ids: Sequence[int]) -> str:
        raise NotImplementedError

    def __call__(self, text: str) -> List[int]:
        return self.encode(text)


class ByteTokenizer(BaseTokenizer):
    """Byte-level tokenizer with exact roundtrip; ids = byte + 3 specials.

    A space byte separates words on decode, mirroring the reference's
    " ".join(words) compaction (src/_modules.py:1119).
    """

    def __init__(self) -> None:
        self.vocab_size = 256 + self._first_content_id
        self._space_id = ord(" ") + self._first_content_id

    def encode_word(self, word: str) -> List[int]:
        return [b + self._first_content_id for b in word.encode("utf-8")]

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        for i, w in enumerate(text.split()):
            if i > 0:
                out.append(self._space_id)
            out.extend(self.encode_word(w))
        return out

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(
            i - self._first_content_id
            for i in ids
            if i >= self._first_content_id and i < self.vocab_size
        )
        return data.decode("utf-8", errors="ignore")


class HashTokenizer(BaseTokenizer):
    """Deterministic hash-based subword tokenizer at a T5-sized vocab.

    Words map to 1-3 subword ids via a stable blake2 hash of (word, piece_idx);
    the instance memoizes a reverse map so decode() recovers words it has seen
    (sufficient for closed-book eval where answers appear in the corpus).

    Cross-process caveat: ids are stable (blake2), but decode() only knows
    words encoded IN THIS PROCESS. To make decode survive a process boundary
    (train in one process, `eval.py --ckpt` in another), the trainer persists
    the reverse map alongside the Orbax checkpoint (`save_vocab`) and the CLIs
    reload it (`load_vocab`). Real tokenizers (`--hf-weights` dirs /
    HFTokenizer) decode any id and do not need this.
    """

    def __init__(self, vocab_size: int = 32128, max_pieces: int = 3) -> None:
        self.vocab_size = vocab_size
        self.max_pieces = max_pieces
        self._reverse: Dict[tuple, str] = {}
        self._word_cache: Dict[str, List[int]] = {}

    def _n_pieces(self, word: str) -> int:
        # Longer/rarer words get more pieces, like a real subword model.
        return min(1 + len(word) // 6, self.max_pieces)

    def _piece_id(self, word: str, idx: int) -> int:
        h = hashlib.blake2b(f"{word}\x00{idx}".encode("utf-8"), digest_size=8).digest()
        rng = self.vocab_size - self._first_content_id
        return self._first_content_id + int.from_bytes(h, "little") % rng

    def encode_word(self, word: str) -> List[int]:
        ids = self._word_cache.get(word)
        if ids is None:
            n = self._n_pieces(word)
            ids = [self._piece_id(word, i) for i in range(n)]
            self._reverse[tuple(ids)] = word
            self._word_cache[word] = ids
        return ids

    def save_vocab(self, path: str) -> None:
        """Persist the reverse map so a fresh process can decode (JSON:
        one [word, [ids...]] pair per seen word)."""
        import json

        with open(path, "w") as f:
            json.dump([[w, ids] for w, ids in self._word_cache.items()], f)

    def load_vocab(self, path: str) -> None:
        """Merge a persisted reverse map (ids are hash-stable, so entries
        from any process agree; collisions keep the incoming word last)."""
        import json

        with open(path) as f:
            for word, ids in json.load(f):
                self._word_cache[word] = list(ids)
                self._reverse[tuple(ids)] = word

    def decode(self, ids: Sequence[int]) -> str:
        ids = [i for i in ids if i >= self._first_content_id]
        words: List[str] = []
        i = 0
        while i < len(ids):
            matched = False
            for ln in range(self.max_pieces, 0, -1):
                key = tuple(ids[i : i + ln])
                if key in self._reverse:
                    words.append(self._reverse[key])
                    i += ln
                    matched = True
                    break
            if not matched:
                i += 1
        return " ".join(words)


class HFTokenizer(BaseTokenizer):
    """Wraps a locally cached HuggingFace tokenizer (no network)."""

    def __init__(self, path: str) -> None:
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.vocab_size = len(self._tok)
        self.pad_id = self._tok.pad_token_id or 0
        self.eos_id = self._tok.eos_token_id or 1
        self.unk_id = self._tok.unk_token_id or 2
        self._word_cache: Dict[str, List[int]] = {}

    def encode_word(self, word: str) -> List[int]:
        ids = self._word_cache.get(word)
        if ids is None:
            # Drop the EOS the HF T5 tokenizer appends (src/VT5.py:160).
            ids = self._tok(word).input_ids
            if ids and ids[-1] == self.eos_id:
                ids = ids[:-1]
            self._word_cache[word] = ids
        return list(ids)

    def encode(self, text: str) -> List[int]:
        ids = self._tok(text).input_ids
        if ids and ids[-1] == self.eos_id:
            ids = ids[:-1]
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode([i for i in ids], skip_special_tokens=True)


def load_tokenizer(spec: Optional[str] = None) -> BaseTokenizer:
    """Resolve a tokenizer spec: None/'hash' -> HashTokenizer ('hash:N' sets
    the vocab size), 'byte' -> ByteTokenizer, anything else is treated as a
    local HF tokenizer path."""
    if spec is None or spec == "hash":
        return HashTokenizer()
    if spec.startswith("hash:"):
        return HashTokenizer(vocab_size=int(spec.split(":", 1)[1]))
    if spec == "byte":
        return ByteTokenizer()
    return HFTokenizer(spec)

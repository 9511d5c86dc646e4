"""Tokenizer PRODUCTION surface (round 16 — r15 verdict "what's
missing" #5): the consumable artifact wrapped around the two trainers
(`operators/bpe.py`, `operators/unigram.py`), closing the three gaps
that kept them lab-only:

1. **Save / load round-trip** — a versioned JSON artifact
   (`Tokenizer.save` / `Tokenizer.load`), so a vocabulary trained in
   one session tokenizes in another. Driver-side KB-MB file, the same
   artifact class as SentencePiece's ``.model``.
2. **Special tokens** — reserved strings (``<|endoftext|>``,
   ``<pad>`` ...) split out BEFORE any segmentation and mapped to their
   own ids, never merged into or out of (the HuggingFace
   ``added_tokens`` contract). Specials get the LOWEST ids, then the
   256 byte pieces, then model pieces in rank order — stable for a
   given artifact.
3. **Byte fallback** — any character outside the trained alphabet
   encodes as its UTF-8 bytes via the 256 reserved ``<0xNN>`` pieces
   (SentencePiece's ``byte_fallback``), so ``encode`` is total and
   ``decode(encode(text)) == text`` for ANY input whose words are
   single-space separated — the lossless-round-trip property
   `queries/text_q.tokenizer_roundtrip` audits end-to-end.

Word boundaries: BPE carries its own ``</w>`` end-of-word marker;
unigram pieces carry none, so the encoder emits the reserved ``▁``
separator piece BETWEEN words and the decoder maps it back to a
space — boundaries live in the token stream, not in the vocabulary,
leaving the trained artifact (and its driver-verified seed oracle)
untouched.

Scale shape: the artifact broadcasts by closure (KBs–MBs) exactly like
the raw vocab did; `tokenize_with` is one Arrow crossing, pure map —
the same 100-TB contract as `bpe.apply_bpe` / `unigram.apply_unigram`.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf resolves
# its types from the REAL hints at decoration time (same as bpe.py).
import json
import re

from pyspark.sql import DataFrame, functions as F

_BYTE_PIECES = [f"<0x{i:02X}>" for i in range(256)]
_BYTE_RE = re.compile(r"^<0x([0-9A-F]{2})>$")
_WORD_SEP = "▁"  # ▁ — the SentencePiece word-boundary glyph
_END = "</w>"  # bpe.py's end-of-word marker
_FORMAT_VERSION = 1


class Tokenizer:
    """A trained subword tokenizer as a portable artifact.

    ``kind`` is "bpe" (``merges`` list, rank = position) or "unigram"
    (``vocab`` [(piece, logprob)] list, rank = position). ``alphabet``
    is the training-time character set — the boundary of byte
    fallback. Build via `from_bpe` / `from_unigram`, persist via
    `save` / `load`."""

    def __init__(
        self,
        kind: str,
        merges=None,
        vocab=None,
        alphabet=None,
        special_tokens=None,
        byte_fallback: bool = True,
    ) -> None:
        if kind not in ("bpe", "unigram"):
            raise ValueError(f"kind must be bpe|unigram, got {kind!r}")
        self.kind = kind
        self.merges = [tuple(m) for m in (merges or [])]
        self.vocab = [(p, float(lp)) for p, lp in (vocab or [])]
        self.special_tokens = list(special_tokens or [])
        self.byte_fallback = bool(byte_fallback)
        if kind == "bpe" and not self.merges and merges is None:
            raise ValueError("bpe tokenizer needs merges")
        if kind == "unigram" and not self.vocab:
            raise ValueError("unigram tokenizer needs a vocab")
        for sp in self.special_tokens:
            if not sp or sp != sp.strip():
                raise ValueError(
                    f"special token must be non-empty and unpadded: {sp!r}"
                )
        if alphabet is not None:
            self.alphabet = set(alphabet)
        elif kind == "unigram":
            # unigram's character coverage: its single-char pieces ARE
            # the alphabet
            self.alphabet = {p for p, _ in self.vocab if len(p) == 1}
        else:
            # bpe: recover from the merge symbols (misses never-merged
            # rare chars, which then byte-fall-back — semantically fine)
            self.alphabet = {
                c for a, b in self.merges for c in (a + b).replace(_END, "")
            }
        # ----- id table: specials, byte pieces, then model pieces -----
        pieces: list[str] = []
        if self.kind == "unigram":
            pieces.append(_WORD_SEP)
            pieces.extend(p for p, _ in self.vocab)
        else:
            base = sorted(self.alphabet)
            pieces.append(_END)
            pieces.extend(base)
            pieces.extend(c + _END for c in base)
            for a, b in self.merges:
                pieces.append(a + b)
        seen: set = set(self.special_tokens) | set(_BYTE_PIECES)
        ordered = list(self.special_tokens) + list(_BYTE_PIECES)
        for p in pieces:
            if p not in seen:
                seen.add(p)
                ordered.append(p)
        self.id_of = {p: i for i, p in enumerate(ordered)}
        self.piece_of = ordered
        self._lp = dict(self.vocab) if kind == "unigram" else None
        self._ranks = (
            {pair: i for i, pair in enumerate(self.merges)}
            if kind == "bpe"
            else None
        )
        self._special_re = (
            re.compile(
                "("
                + "|".join(
                    re.escape(t)
                    for t in sorted(self.special_tokens, key=len, reverse=True)
                )
                + ")"
            )
            if self.special_tokens
            else None
        )

    # ------------------------------------------------------ persistence

    def to_dict(self) -> dict:
        return {
            "format_version": _FORMAT_VERSION,
            "kind": self.kind,
            "merges": [list(m) for m in self.merges],
            "vocab": [[p, lp] for p, lp in self.vocab],
            "alphabet": sorted(self.alphabet),
            "special_tokens": self.special_tokens,
            "byte_fallback": self.byte_fallback,
        }

    def save(self, path: str) -> None:
        """Write the artifact as one JSON file (driver-side; KB–MB)."""
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.to_dict(), f, ensure_ascii=False, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "Tokenizer":
        v = d.get("format_version")
        if v != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported tokenizer format_version {v!r} (reader "
                f"implements {_FORMAT_VERSION}) — refusing rather than "
                "mis-tokenizing"
            )
        return cls(
            d["kind"],
            merges=[tuple(m) for m in d.get("merges") or []],
            vocab=[tuple(x) for x in d.get("vocab") or []],
            alphabet=d.get("alphabet"),
            special_tokens=d.get("special_tokens"),
            byte_fallback=d.get("byte_fallback", True),
        )

    @classmethod
    def load(cls, path: str) -> "Tokenizer":
        with open(path, encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_bpe(
        cls, merges, alphabet=None, special_tokens=None,
        byte_fallback: bool = True,
    ) -> "Tokenizer":
        return cls(
            "bpe", merges=merges, alphabet=alphabet,
            special_tokens=special_tokens, byte_fallback=byte_fallback,
        )

    @classmethod
    def from_unigram(
        cls, vocab, special_tokens=None, byte_fallback: bool = True
    ) -> "Tokenizer":
        return cls(
            "unigram", vocab=vocab, special_tokens=special_tokens,
            byte_fallback=byte_fallback,
        )

    # --------------------------------------------------------- encoding

    def _fallback(self, ch: str) -> list:
        if not self.byte_fallback:
            raise ValueError(
                f"character {ch!r} is outside the trained alphabet and "
                "byte_fallback is off"
            )
        return [_BYTE_PIECES[b] for b in ch.encode("utf-8")]

    def _encode_word(self, word: str) -> list:
        """One word -> pieces, byte-falling-back any character the
        model never saw (unknown chars can never be inside a learned
        piece, so they always surface as single-char symbols)."""
        if self.kind == "unigram":
            from wnv_etl_lab2_spark.operators.unigram import viterbi_segment

            out = []
            for piece in viterbi_segment(word, self._lp):
                if piece in self._lp:
                    out.append(piece)
                else:
                    out.extend(self._fallback(piece))
            return out
        from wnv_etl_lab2_spark.operators.bpe import segment_word

        out = []
        for sym in segment_word(word, self._ranks):
            bare = sym[: -len(_END)] if sym.endswith(_END) else sym
            if bare and len(bare) == 1 and bare not in self.alphabet:
                out.extend(self._fallback(bare))
                if sym.endswith(_END):
                    out.append(_END)
            else:
                out.append(sym)
        return out

    def encode(self, text: str) -> list:
        """Text -> pieces. Specials split out first (never segmented);
        words tokenize independently; unigram word boundaries are the
        emitted ``▁`` separator pieces."""
        segments = (
            self._special_re.split(text or "")
            if self._special_re
            else [text or ""]
        )
        out: list = []
        specials = set(self.special_tokens)
        for seg in segments:
            if seg in specials:
                out.append(seg)
                continue
            first = True
            for w in seg.split(" "):
                if not w:
                    continue
                if self.kind == "unigram" and not first:
                    out.append(_WORD_SEP)
                first = False
                out.extend(self._encode_word(w))
        return out

    def encode_ids(self, text: str) -> list:
        return [self.id_of[p] for p in self.encode(text)]

    # --------------------------------------------------------- decoding

    def decode(self, pieces) -> str:
        """Pieces (or ids) -> text. Byte runs re-assemble to UTF-8;
        specials pass through verbatim, space-separated from words."""
        if pieces and isinstance(pieces[0], int):
            pieces = [self.piece_of[i] for i in pieces]
        words: list = []
        cur: list = []  # mix of str fragments and byte ints
        specials = set(self.special_tokens)

        def flush() -> None:
            if not cur:
                return
            buf: list = []
            bts: list = []
            for frag in cur:
                if isinstance(frag, int):
                    bts.append(frag)
                    continue
                if bts:
                    buf.append(bytes(bts).decode("utf-8", errors="replace"))
                    bts = []
                buf.append(frag)
            if bts:
                buf.append(bytes(bts).decode("utf-8", errors="replace"))
            words.append("".join(buf))
            cur.clear()

        for p in pieces:
            if p in specials:
                flush()
                words.append(p)
                continue
            if p == _WORD_SEP:
                flush()
                continue
            mb = _BYTE_RE.match(p)
            if mb:
                cur.append(int(mb.group(1), 16))
                continue
            if p == _END:
                flush()
                continue
            if p.endswith(_END):
                cur.append(p[: -len(_END)])
                flush()
                continue
            cur.append(p)
        flush()
        return " ".join(words)

    @property
    def vocab_size(self) -> int:
        return len(self.piece_of)


def roundtrip_udf(payload: dict, special: str):
    """A (text -> struct(ok, dec_len, n_spec)) pandas UDF auditing the
    lossless contract per row: re-hydrate the artifact from its
    serialized ``payload`` (what a fresh session would load), encode,
    decode, and report whether decode(encode(x)) == x plus the decoded
    length and the count of ``special`` pieces in the token stream.
    Lives here (not in the query module) because pandas_udf resolves
    type hints at decoration time and the query modules' ``from
    __future__ import annotations`` stringifies them."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<ok: boolean, dec_len: long, n_spec: long>")
    def roundtrip(texts: pd.Series) -> pd.DataFrame:
        t = Tokenizer.from_dict(payload)
        ok, dec_len, n_spec = [], [], []
        for x in texts:
            pieces = t.encode(x)
            dec = t.decode(pieces)
            ok.append(dec == x)
            dec_len.append(len(dec))
            n_spec.append(sum(1 for p in pieces if p == special))
        return pd.DataFrame({"ok": ok, "dec_len": dec_len, "n_spec": n_spec})

    return roundtrip


def tokenize_with(
    tok: Tokenizer, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus tokenization with a loaded artifact: pure map, one Arrow
    crossing, artifact broadcast by closure. Returns (doc_id, tokens,
    token_ids, n_tokens) — `bpe.apply_bpe`'s contract plus ids."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    payload = tok.to_dict()

    @pandas_udf("struct<tokens: array<string>, token_ids: array<int>>")
    def run(texts: pd.Series) -> pd.DataFrame:
        t = Tokenizer.from_dict(payload)
        toks, ids = [], []
        for text in texts:
            p = t.encode(text)
            toks.append(p)
            ids.append([t.id_of[x] for x in p])
        return pd.DataFrame({"tokens": toks, "token_ids": ids})

    return (
        docs.select("doc_id", run(F.col(text_col)).alias("_t"))
        .select(
            "doc_id",
            F.col("_t.tokens").alias("tokens"),
            F.col("_t.token_ids").alias("token_ids"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
    )

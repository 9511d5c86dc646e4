"""Tokenizer production surface (round 16): save/load round-trip,
special tokens, byte fallback, id mapping, distributed apply."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.operators.bpe import train_bpe
from wnv_etl_lab2_spark.operators.tokenizer import (
    _BYTE_PIECES,
    Tokenizer,
    tokenize_with,
)
from wnv_etl_lab2_spark.operators.unigram import train_unigram


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the lazy dog sleeps while the quick fox runs"),
        (3, "pack my box with five dozen liquor jugs"),
        (4, "how quickly daft jumping zebras vex the dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bpe_tok(docs):
    merges = train_bpe(docs, n_merges=30)
    return Tokenizer.from_bpe(
        merges, special_tokens=["<|endoftext|>", "<pad>"]
    )


@pytest.fixture(scope="module")
def uni_tok(docs):
    vocab = train_unigram(docs, vocab_size=120, iters=2)
    return Tokenizer.from_unigram(
        vocab, special_tokens=["<|endoftext|>", "<pad>"]
    )


@pytest.mark.parametrize("which", ["bpe", "unigram"])
def test_roundtrip_with_specials_and_oov(which, bpe_tok, uni_tok):
    tok = bpe_tok if which == "bpe" else uni_tok
    # é and 字 were never in the training corpus -> byte fallback;
    # specials pass through unsplit
    text = "the quick café 漢字 dog <|endoftext|> next doc <pad>"
    pieces = tok.encode(text)
    assert "<|endoftext|>" in pieces and "<pad>" in pieces
    assert any(p.startswith("<0x") for p in pieces)  # fallback fired
    assert tok.decode(pieces) == text
    # id round-trip too
    ids = tok.encode_ids(text)
    assert tok.decode(ids) == text
    # specials own the lowest ids, bytes the next 256
    assert tok.id_of["<|endoftext|>"] == 0 and tok.id_of["<pad>"] == 1
    assert tok.id_of[_BYTE_PIECES[0]] == 2
    assert tok.id_of[_BYTE_PIECES[255]] == 257


@pytest.mark.parametrize("which", ["bpe", "unigram"])
def test_save_load_roundtrip(which, bpe_tok, uni_tok, tmp_path):
    tok = bpe_tok if which == "bpe" else uni_tok
    p = str(tmp_path / f"{which}.tokenizer.json")
    tok.save(p)
    back = Tokenizer.load(p)
    assert back.kind == tok.kind
    assert back.piece_of == tok.piece_of  # identical id table
    text = "the lazy dog café <|endoftext|>"
    assert back.encode_ids(text) == tok.encode_ids(text)
    assert back.decode(back.encode(text)) == text


def test_format_version_gate(tmp_path, bpe_tok):
    import json

    p = str(tmp_path / "t.json")
    bpe_tok.save(p)
    d = json.load(open(p))
    d["format_version"] = 99
    json.dump(d, open(p, "w"))
    with pytest.raises(ValueError, match="format_version"):
        Tokenizer.load(p)


def test_byte_fallback_off_refuses(bpe_tok):
    tok = Tokenizer.from_bpe(
        bpe_tok.merges, alphabet=bpe_tok.alphabet, byte_fallback=False
    )
    with pytest.raises(ValueError, match="outside the trained alphabet"):
        tok.encode("café")
    # in-alphabet text still encodes
    assert tok.decode(tok.encode("the dog")) == "the dog"


def test_specials_never_segment(uni_tok):
    # a special containing trained characters must not be split even
    # when its characters segment greedily
    pieces = uni_tok.encode("the<|endoftext|>the")
    assert pieces.count("<|endoftext|>") == 1
    joined = "".join(p for p in pieces if not p.startswith("<"))
    assert "endoftext" not in joined


@pytest.mark.parametrize("which", ["bpe", "unigram"])
def test_tokenize_with_distributed_matches_driver(
    which, docs, bpe_tok, uni_tok
):
    tok = bpe_tok if which == "bpe" else uni_tok
    got = {
        r.doc_id: (list(r.tokens), list(r.token_ids), r.n_tokens)
        for r in tokenize_with(tok, docs).collect()
    }
    for row in docs.collect():
        pieces = tok.encode(row.text)
        ids = tok.encode_ids(row.text)
        assert got[row.doc_id] == (pieces, ids, len(pieces))
        # and the distributed output decodes back to the source text
        assert tok.decode(got[row.doc_id][0]) == row.text

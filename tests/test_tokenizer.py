import numpy as np

import pytest

from genima_tpu.data.tokenizer import (
    ClipTokenizer,
    HashTokenizer,
    bytes_to_unicode,
    whitespace_clean,
)

pytestmark = pytest.mark.fast


def _tiny_tokenizer():
    # synthetic merge list exercising the BPE machinery
    merges = [
        ("r", "o"),
        ("ro", "b"),
        ("rob", "o"),
        ("robo", "t</w>"),
        ("a", "r"),
        ("ar", "m</w>"),
    ]
    return ClipTokenizer(merges)


def test_bytes_to_unicode_bijection():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_bpe_merges_apply():
    tok = _tiny_tokenizer()
    ids = tok.encode("robot")
    # 'robot' fully merges into a single token
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "robot</w>"
    ids_arm = tok.encode("arm")
    assert tok.decoder[ids_arm[0]] == "arm</w>"


def test_padding_and_specials():
    tok = _tiny_tokenizer()
    arr = tok(["robot arm"])
    assert arr.shape == (1, 77)
    assert arr[0, 0] == tok.sot
    assert arr[0, 3] == tok.eot
    assert (arr[0, 4:] == 0).all()


def test_truncation_keeps_eot():
    tok = _tiny_tokenizer()
    arr = tok(["robot " * 200])
    assert arr.shape == (1, 77)
    assert arr[0, -1] == tok.eot


def test_lowercase_and_whitespace():
    tok = _tiny_tokenizer()
    assert tok.encode("ROBOT") == tok.encode("robot")
    assert whitespace_clean("a   b\n c") == "a b c"


def test_decode_roundtrip():
    tok = _tiny_tokenizer()
    ids = tok.encode("robot arm")
    assert tok.decode(ids).strip() == "robot arm"


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer()
    a = tok("pick up the cup")
    b = tok("pick up the cup")
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 77)
    assert a[0, 0] == tok.sot


def test_load_tokenizer_contract(tmp_path):
    """Silent hash degradation is gone: explicit-missing raises, implicit
    fallback warns loudly, allow_hash_fallback=False is a hard error."""
    import warnings

    from genima_tpu.data.tokenizer import VENDORED_VOCAB, load_tokenizer

    with np.testing.assert_raises(FileNotFoundError):
        load_tokenizer(str(tmp_path / "nope.txt"))

    if not VENDORED_VOCAB.exists():
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            tok = load_tokenizer(None)
        assert isinstance(tok, HashTokenizer)
        assert any("HASH tokenizer" in str(w.message) for w in rec)
        with np.testing.assert_raises(FileNotFoundError):
            load_tokenizer(None, allow_hash_fallback=False)
    else:
        tok = load_tokenizer(None)
        assert isinstance(tok, ClipTokenizer)


def test_real_vocab_golden_ids():
    """With the vendored OpenAI merge table: known prompt -> known ids
    (expected values produced by openai/CLIP clip.tokenize)."""
    import pytest

    from genima_tpu.data.tokenizer import VENDORED_VOCAB, load_tokenizer

    if not VENDORED_VOCAB.exists():
        pytest.skip("real CLIP vocab not vendored (zero-egress environment);"
                    " run scripts/download_clip_vocab.sh")
    tok = load_tokenizer(None)
    ids = np.asarray(tok.encode(["hello world"]))[0]
    # clip.tokenize("hello world") == [49406, 3306, 1002, 49407, 0, ...]
    assert ids[0] == 49406 and ids[3] == 49407
    np.testing.assert_array_equal(ids[1:3], [3306, 1002])
    assert ids.shape == (77,)

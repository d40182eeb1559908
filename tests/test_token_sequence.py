"""TokenSequence/Vocab builder parity (llm/modules/tokens.py:7-171)."""

import numpy as np
import pytest

from landiff_tpu.models.token_sequence import (IGNORE_INDEX, TokenSequence,
                                               Vocab)


def test_vocab_ranges_and_specials():
    v = Vocab()
    v.add_range("visual", 2048)
    for sp in ("EOS", "BOS", "START_OF_IFrame", "END_OF_IFrame",
               "START_OF_PFrame", "END_OF_PFrame", "PAD"):
        v.add_special(sp)
    assert v.size() == 2055
    assert v.range("visual") == (0, 2048)
    assert v.EOS == 2048 and v.BOS == 2049 and v.PAD == 2054
    with pytest.raises(AttributeError):
        v.MISSING


def test_interleaved_build_and_ranges():
    seq = TokenSequence()
    seq.append_token(np.array([5]), False, name="bos")
    feat = np.arange(12, dtype=np.float32).reshape(3, 4)
    seq.append_feature(feat, name="text")
    seq.append_token(np.array([7, 8, 9]), True, name="codes")
    tok_feat = np.ones((2, 4), np.float32)
    seq.append_token_and_feature(np.array([1, 2]), tok_feat,
                                 np.array([True, False]), name="mix")
    assert len(seq) == 9
    assert seq.ranges == {"bos": (0, 1), "text": (1, 4), "codes": (4, 7),
                          "mix": (7, 9)}
    tokens = seq.get_tokens()
    # feature-only spans get IGNORE_INDEX (-100), like the reference
    np.testing.assert_array_equal(
        tokens, [5, IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 7, 8, 9, 1, 2])
    np.testing.assert_array_equal(
        seq.get_loss_mask(),
        [False, False, False, False, True, True, True, True, False])

    emb = np.zeros((16, 4), np.float32)
    emb[np.arange(16), 0] = np.arange(16)
    feats = np.asarray(seq.get_features(emb))
    assert feats.shape == (9, 4)
    np.testing.assert_allclose(feats[1:4], feat)      # injected feature
    np.testing.assert_allclose(feats[4:7, 0], [7, 8, 9])  # embedded tokens
    np.testing.assert_allclose(feats[7:9], tok_feat)  # explicit override


def test_feature_without_embedding_raises():
    seq = TokenSequence()
    seq.append_token(np.array([1, 2]), False)
    with pytest.raises(AssertionError):
        seq.get_features(None)


def test_collate():
    def build(offset):
        s = TokenSequence()
        s.append_token(np.array([offset]), False)
        s.append_feature(np.full((2, 3), float(offset), np.float32))
        return s

    tokens, features, mask = TokenSequence.collate(
        [build(1), build(2)], embedding=np.zeros((8, 3), np.float32))
    assert tokens.shape == (2, 3)
    assert features.shape == (2, 3, 3)
    assert mask.shape == (2, 3) and not mask.any()
    np.testing.assert_array_equal(tokens[:, 0], [1, 2])

    bad = TokenSequence()
    bad.append_token(np.array([1]), False)
    with pytest.raises(AssertionError):
        TokenSequence.collate([build(1), bad])

from whisper_tpu.evaluation import (
    char_error_rate,
    edit_distance,
    word_error_rate,
)


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], []) == 0
    assert edit_distance(["a", "b"], ["a", "b"]) == 0
    assert edit_distance(["a"], []) == 1


def test_word_error_rate():
    refs = ["the quick brown fox", "hello world"]
    hyps = ["the quick brown fox", "hello there world"]
    # 1 insertion over 6 reference words
    assert abs(word_error_rate(refs, hyps, normalizer=str.lower) - 1 / 6) < 1e-9


def test_wer_with_normalizer():
    # normalizer folds case/punct/numbers so these count as exact
    refs = ["Mr. Smith paid $20 million!"]
    hyps = ["mister smith paid twenty million dollars"]
    assert word_error_rate(refs, hyps) == 0.0


def test_cer():
    assert char_error_rate(["abc"], ["abc"], normalizer=str.lower) == 0.0
    assert char_error_rate(["abcd"], ["abed"], normalizer=str.lower) == 0.25

import pytest

from whisper_tpu.tokenizer import get_tokenizer


def test_tokenizer():
    # mirrors reference tests/test_tokenizer.py:6-11
    gpt2_tokenizer = get_tokenizer(multilingual=False)
    multilingual_tokenizer = get_tokenizer(multilingual=True)

    text = "다람쥐 헌 쳇바퀴에 타고파"
    gpt2_tokens = gpt2_tokenizer.encode(text)
    multilingual_tokens = multilingual_tokenizer.encode(text)

    assert gpt2_tokenizer.decode(gpt2_tokens) == text
    assert multilingual_tokenizer.decode(multilingual_tokens) == text
    assert len(gpt2_tokens) > len(multilingual_tokens)


def test_multilingual_tokenizer():
    tokenizer = get_tokenizer(multilingual=True)
    assert tokenizer.sot in tokenizer.sot_sequence
    assert len(tokenizer.all_language_codes) == tokenizer.num_languages
    assert all(c < tokenizer.timestamp_begin for c in tokenizer.all_language_tokens)
    assert all(c.isalpha() or c == "yue" for c in tokenizer.all_language_codes)


def test_split_on_unicode():
    # mirrors reference tests/test_tokenizer.py:27-34 (U+FFFD handling)
    multilingual_tokenizer = get_tokenizer(multilingual=True)

    tokens = [8404, 871, 287, 6, 246, 526, 3210, 20378]
    words, word_tokens = multilingual_tokenizer.split_tokens_on_unicode(tokens)

    assert words == [" elle", " est", " l", "'", "�", "é", "rit", "oire"]
    assert word_tokens == [[8404], [871], [287], [6], [246], [526], [3210], [20378]]


@pytest.mark.reference
def test_parity_with_tiktoken():
    from _reference import import_reference

    ref_whisper = import_reference()
    for multilingual in (False, True):
        ours = get_tokenizer(multilingual, language="en" if multilingual else None,
                             task="transcribe" if multilingual else None)
        ref = ref_whisper.tokenizer.get_tokenizer(
            multilingual, language="en" if multilingual else None,
            task="transcribe" if multilingual else None)
        for text in [
            "Hello, world!",
            "The quick brown fox jumps over the lazy dog.",
            "안녕하세요 세계!",
            "こんにちは世界",
            "   multiple   spaces  ",
            "don't can't won't 'tis",
            "123 456.789 -42",
            "émigré naïve façade",
            "♪♪♪ (SPEAKING FOREIGN LANGUAGE) [DAVID]",
        ]:
            assert ours.encode(text) == ref.encode(text), text
            assert ours.decode(ours.encode(text)) == ref.decode(ref.encode(text))
        assert ours.sot_sequence == ref.sot_sequence
        assert ours.non_speech_tokens == ref.non_speech_tokens
        if multilingual:
            assert ours.all_language_tokens == ref.all_language_tokens
            assert ours.all_language_codes == ref.all_language_codes
            ko = ours.encode("안녕하세요 세계 테스트입니다")
            assert ours.split_tokens_on_unicode(ko) == ref.split_tokens_on_unicode(ko)

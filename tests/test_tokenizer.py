"""Tokenizer parity vs HF transformers CLIPTokenizer on shared vocab files."""
import numpy as np
import pytest

from e4t_diffusion_tpu.utils.tokenizer import (
    CLIPTokenizer,
    make_tiny_tokenizer_files,
)


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    return make_tiny_tokenizer_files(
        str(d), extra_words=["photo", "of", "a", "the", "face", "cat"])


def test_matches_hf_clip_tokenizer(tok_dir):
    from transformers import CLIPTokenizer as HFTok

    hf = HFTok(vocab_file=f"{tok_dir}/vocab.json",
               merges_file=f"{tok_dir}/merges.txt", model_max_length=77)
    ours = CLIPTokenizer.from_pretrained(tok_dir)
    for text in ["a photo of face", "the cat", "a  PHOTO of the cat!",
                 "", "face face face"]:
        a = ours(text, padding="max_length", truncation=True, max_length=77)
        b = hf(text, padding="max_length", truncation=True, max_length=77)
        assert a["input_ids"][0] == b["input_ids"], text


def test_added_placeholder_token(tok_dir):
    from transformers import CLIPTokenizer as HFTok

    hf = HFTok(vocab_file=f"{tok_dir}/vocab.json",
               merges_file=f"{tok_dir}/merges.txt", model_max_length=77)
    ours = CLIPTokenizer.from_pretrained(tok_dir)
    assert ours.add_tokens("*s") == 1
    assert ours.add_tokens("*s") == 0  # idempotent
    assert hf.add_tokens("*s") == 1
    assert (ours.convert_tokens_to_ids("*s")
            == hf.convert_tokens_to_ids("*s"))
    a = ours("a photo of *s", max_length=77)
    b = hf("a photo of *s", padding="max_length", truncation=True,
           max_length=77)
    assert a["input_ids"][0] == b["input_ids"]
    # the placeholder must be findable in the encoded prompt
    # (/root/reference/e4t/pipeline_stable_diffusion_e4t.py:76-79)
    assert ours.convert_tokens_to_ids("*s") in a["input_ids"][0]


def test_single_token_check(tok_dir):
    """scripts/check_domain_class_token.py contract: class token must be
    exactly one token."""
    ours = CLIPTokenizer.from_pretrained(tok_dir)
    ids = ours("face", add_special_tokens=False, padding=None)["input_ids"][0]
    assert len(ids) == 1

"""Assert the domain class token encodes to exactly one CLIP token.

Parity with /root/reference/scripts/check_domain_class_token.py, with a
local tokenizer path instead of a hub id (no egress on TPU pods).

Usage: python scripts/check_domain_class_token.py <token> <tokenizer_dir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

from e4t_diffusion_tpu.utils.tokenizer import CLIPTokenizer

if __name__ == "__main__":
    domain_class_token = sys.argv[1] if len(sys.argv) > 1 else "art"
    tokenizer_dir = sys.argv[2]
    tokenizer = CLIPTokenizer.from_pretrained(tokenizer_dir)
    token_id = tokenizer(domain_class_token, add_special_tokens=False,
                         padding=None)["input_ids"][0]
    assert len(token_id) == 1, (
        f"{domain_class_token!r} is {len(token_id)} tokens; "
        f"choose a single-token class word")
    print(f"ok: {domain_class_token!r} -> token id {token_id[0]}")

"""Published-model registry + hub download (reference utils parity).

Mirrors /root/reference/e4t/utils.py:43-73: the MODELS registry of
published E4T artifacts, the FILES list, and download_from_huggingface
with the 401 (login) / 403 (license click-through) retry loop. On
egress-less TPU pods the download path raises with staging instructions;
set E4T_MODELS_DIR to resolve registry names against a local mirror.
"""
from __future__ import annotations

import os
from typing import Optional

MODELS = {
    "e4t-diffusion-ffhq-celebahq-v1": {
        "repo": "mshing/e4t-diffusion-ffhq-celebahq-v1",
        "subfolder": None,
    }
}
FILES = ["weight_offsets.pt", "encoder.pt", "config.json"]


def download_from_huggingface(repo: str, filename: str, **kwargs) -> str:
    """HF Hub download with the reference's auth retry semantics."""
    try:
        import huggingface_hub
    except ImportError as e:
        raise RuntimeError(
            "huggingface_hub is unavailable; stage the checkpoint locally "
            "and point E4T_MODELS_DIR at it") from e
    while True:
        try:
            return huggingface_hub.hf_hub_download(repo, filename=filename,
                                                   **kwargs)
        except Exception as e:
            status = getattr(getattr(e, "response", None), "status_code", None)
            if status == 401:
                huggingface_hub.interpreter_login()
                continue
            if status == 403:
                print(f"Go here and agree to the click through license on "
                      f"your account: https://huggingface.co/{repo}")
                input("Hit enter when ready:")
                continue
            raise


def resolve_model_dir(name_or_path: str) -> str:
    """Registry name or path -> local artifact directory.

    Resolution order: existing local path; $E4T_MODELS_DIR/<name>; HF Hub
    download of the registry FILES (+unet.pt fallback when
    weight_offsets.pt is absent, /root/reference/e4t/utils.py:101-112).
    """
    if os.path.exists(name_or_path):
        return name_or_path
    assert name_or_path in MODELS, (
        f"{name_or_path!r} is neither a local path nor one of "
        f"{list(MODELS.keys())}")
    mirror = os.environ.get("E4T_MODELS_DIR")
    if mirror:
        local = os.path.join(mirror, name_or_path)
        if os.path.isdir(local):
            return local
    entry = MODELS[name_or_path]
    last: Optional[str] = None
    for filename in FILES:
        try:
            last = download_from_huggingface(
                entry["repo"], filename, subfolder=entry["subfolder"])
        except Exception:
            if filename == "weight_offsets.pt":
                last = download_from_huggingface(
                    entry["repo"], "unet.pt", subfolder=entry["subfolder"])
            else:
                raise
    return os.path.dirname(last)

"""Prompt template sets (training-time captions).

Same template strings as the reference (/root/reference/pretrain_e4t.py:
36-62) — these are behavioral configuration, required for checkpoint
compatibility of trained models.
"""

templates = [
    "a photo of {placeholder_token}",
    "the photo of {placeholder_token}",
    "a photo of a {placeholder_token}",
    "a photo of the {placeholder_token}",
    "a photo of one {placeholder_token}",
    "a close-up photo of the {placeholder_token}",
    "a bright photo of the {placeholder_token}",
    "a photo of a nice {placeholder_token}",
    "a good photo of {placeholder_token}",
    "a photo of a cool {placeholder_token}",
]

face_templates = templates + [
    "a portrait of {placeholder_token}",
    "the portrait of {placeholder_token}",
    "a portrait photo of {placeholder_token}",
    "portrait of {placeholder_token}",
    "portrait of the {placeholder_token}",
    "photo realistic portrait of {placeholder_token}",
]

art_templates = templates + [
    "art of {placeholder_token}",
    "art by {placeholder_token}",
]

TEMPLATE_SETS = {"normal": templates, "face": face_templates,
                 "art": art_templates}


def resolve_templates(prompt_template: str):
    """'normal'|'face'|'art' or a custom '{placeholder_token}' template
    (/root/reference/pretrain_e4t.py:571-581)."""
    if prompt_template in TEMPLATE_SETS:
        return TEMPLATE_SETS[prompt_template]
    assert "{placeholder_token}" in prompt_template, (
        "You must specify the location of placeholder token by "
        "'{placeholder_token}'")
    return [prompt_template]

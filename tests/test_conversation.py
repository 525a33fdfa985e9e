"""Byte-level prompt parity between vitron_tpu conversations and the reference."""
import pytest

from vitron_tpu.mm import conversation as conv


TEMPLATES = [
    "default", "v0", "v1", "vicuna_v1", "llama_2", "plain", "v0_plain",
    "llava_v0", "v0_mmtag", "llava_v1", "v1_mmtag", "llava_llama_2", "mpt",
]


def _prompt_or_exc(c):
    try:
        return c.get_prompt()
    except Exception as e:  # plain template with sep2=None raises in both
        return f"RAISED:{type(e).__name__}"


@pytest.mark.parametrize("name", TEMPLATES)
def test_prompt_parity_simple_exchange(name, ref_conversation):
    ours = conv.conv_templates[name].copy()
    ref = ref_conversation.conv_templates[name].copy()
    for c in (ours, ref):
        c.append_message(c.roles[0], "Describe the <image> please.")
        c.append_message(c.roles[1], "It is a cat.")
        c.append_message(c.roles[0], "What color?")
        c.append_message(c.roles[1], None)
    assert _prompt_or_exc(ours) == _prompt_or_exc(ref)


@pytest.mark.parametrize("name", ["llava_v1", "v1_mmtag", "llava_v0", "mpt"])
def test_prompt_parity_tuple_first_message(name, ref_conversation):
    """First message carrying (text, image, mode) triggers <image> hoisting."""
    ours = conv.conv_templates[name].copy()
    ref = ref_conversation.conv_templates[name].copy()
    for c in (ours, ref):
        c.append_message(c.roles[0], ("what is in <image> here?", "IMG", "Default"))
        c.append_message(c.roles[1], None)
    assert ours.get_prompt() == ref.get_prompt()


def test_multi_turn_parity(ref_conversation):
    ours = conv.conv_templates["llava_v1"].copy()
    ref = ref_conversation.conv_templates["llava_v1"].copy()
    turns = [
        ("<image>\nsegment the dog", "<module>B</module><instruction>dog</instruction> done"),
        ("now track it in <video>", "<module>E</module> tracking"),
    ]
    for user, asst in turns:
        for c in (ours, ref):
            c.append_message(c.roles[0], user)
            c.append_message(c.roles[1], asst)
    assert ours.get_prompt() == ref.get_prompt()


def test_clear_and_copy():
    c = conv.conv_templates["llava_v1"].copy()
    c.append_message(c.roles[0], "hi")
    c2 = c.copy()
    c.clear_message()
    assert len(c.messages) == 0
    assert len(c2.messages) == 1


def test_to_chatbot_history_rendering():
    """to_gradio_chatbot parity (reference conversation.py:162-191): pairs,
    offset hiding, inline <img> for media tuples."""
    import numpy as np

    from vitron_tpu.mm.conversation import conv_templates

    conv = conv_templates["llava_v1"].copy()
    img = np.zeros((64, 48, 3), np.uint8)
    conv.append_message(conv.roles[0], ("<image>\nwhat is this?", img, "Crop"))
    conv.append_message(conv.roles[1], "A dark rectangle.")
    conv.append_message(conv.roles[0], "thanks")
    conv.append_message(conv.roles[1], None)
    chat = conv.to_chatbot()
    assert len(chat) == 2
    user0, asst0 = chat[0]
    assert user0.startswith('<img src="data:image/png;base64,')
    assert "what is this?" in user0 and "<image>" not in user0
    assert asst0 == "A dark rectangle."
    assert chat[1] == ["thanks", None]
    # alias matches the reference method name
    assert conv.to_gradio_chatbot() == chat

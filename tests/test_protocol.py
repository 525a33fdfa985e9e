"""Protocol parsing parity with the reference regexes (app.py:345-395)."""
from vitron_tpu.mm import protocol


def test_full_structured_output():
    out = (
        "Sure, here is the segmentation. "
        "<module>image_segmentation</module>"
        "<instruction>target: the red car</instruction>"
        "<region>[10, 20, 100, 200]</region> Done."
    )
    text, module, instruction, region = protocol.parse_model_output(out)
    assert module == "image_segmentation"
    assert instruction == ["the red car"]
    assert region == "[10, 20, 100, 200]"
    assert "<module>" not in text


def test_multiple_instructions_keep_after_colon():
    out = (
        "<instruction>caption: a cat on a mat</instruction>"
        "<instruction>another one</instruction>"
    )
    _, _, instruction, _ = protocol.parse_model_output(out)
    assert instruction == ["a cat on a mat", "another one"]


def test_no_tags():
    text, module, instruction, region = protocol.parse_model_output("plain answer")
    assert text == "plain answer"
    assert module is None and instruction is None and region is None


def test_remove_special_tags_strips_spans():
    s = "a <module>B</module> b <region>r</region> c"
    assert protocol.remove_special_tags(s) == "a  b  c"


def test_task_letters_complete():
    assert set(protocol.TASK_NAMES) == set("ABCDEFG")

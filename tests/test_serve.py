"""HTTP serving: health + chat round-trip over a live socket."""
import base64
import io
import json
import urllib.request

import numpy as np
import pytest

import jax

from vitron_tpu.apps.serve import serve
from vitron_tpu.models import vitron_model
from vitron_tpu.runtime.engine import VitronEngine
from vitron_tpu.runtime.system import VitronSystem


class DemoTok:
    bos_token_id = 1
    eos_token_id = 2

    def __call__(self, s):
        class R:
            pass

        r = R()
        r.input_ids = [1] + [abs(hash(w)) % 200 + 10 for w in s.split()]
        return r

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(t) for t in ids)


@pytest.fixture(scope="module")
def server():
    cfg = vitron_model.VitronConfig.tiny()
    params = vitron_model.init_params(jax.random.PRNGKey(0), cfg)
    system = VitronSystem(VitronEngine(params, cfg, DemoTok()))
    srv = serve(system, host="127.0.0.1", port=0, background=True)
    yield srv
    srv.shutdown()


def _url(server, path):
    return f"http://127.0.0.1:{server.server_address[1]}{path}"


def test_health(server):
    with urllib.request.urlopen(_url(server, "/health")) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert data["backends"] == {}


def test_chat_with_image(server):
    from PIL import Image

    img = np.random.RandomState(0).randint(0, 255, (40, 40, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    payload = json.dumps({
        "prompt": "what is this?",
        "image": base64.b64encode(buf.getvalue()).decode(),
        "greedy": True, "max_new_tokens": 4,
    }).encode()
    req = urllib.request.Request(_url(server, "/chat"), data=payload,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        data = json.loads(r.read())
    assert data["status"] == "chat"
    assert len(data["raw"]) > 0


def test_bad_path(server):
    req = urllib.request.Request(_url(server, "/nope"), data=b"{}")
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_malformed_body_returns_500(server):
    req = urllib.request.Request(_url(server, "/chat"), data=b"not json",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert "error" in json.loads(e.read())


def test_stats_reports_memory_plan(server):
    with urllib.request.urlopen(_url(server, "/stats")) as r:
        data = json.loads(r.read())
    assert data["fits"] is True
    assert "llm+towers" in data["entries"]
    assert "budget" in data["report"]


def _b64_png(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_ui_page_and_fetch_contract(server):
    """The browser UI's exact payload shapes (serve.py send()): the page
    must expose every element id the JS references, and /chat must accept
    text-only, region-box (float coords from scaleBox), and sketch
    (white-on-black PNG from maskB64) bodies."""
    with urllib.request.urlopen(_url(server, "/")) as r:
        html = r.read().decode()
    for el in ("log", "prompt", "image", "media", "greedy", "pad"):
        assert f'id="{el}"' in html, el
    assert "<canvas" in html and "async function send" in html

    img = np.random.RandomState(0).randint(0, 255, (48, 40, 3), np.uint8)
    sketch = np.zeros((48, 40, 3), np.uint8)
    sketch[10:30, 8:25] = 255
    bodies = [
        {"prompt": "hello", "greedy": True},
        {"prompt": "this region?", "greedy": True, "image": _b64_png(img),
         "region": [4.5, 5.2, 30.9, 35.1]},
        {"prompt": "segment my circle", "greedy": True,
         "image": _b64_png(img), "sketch": _b64_png(sketch)},
    ]
    for body in bodies:
        req = urllib.request.Request(
            _url(server, "/chat"), data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out.get("status") in ("chat", "ok", "error"), out
        assert "error" not in out or not out["error"], out

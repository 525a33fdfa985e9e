"""HTTP serving app: JSON chat API over the VitronSystem.

The reference ships only a Gradio demo that reloads backend checkpoints per
request (reference: app.py:839-1131, 94-103). This is a minimal stdlib HTTP
server with resident weights: POST /chat with JSON
{"prompt": str, "image": base64-png?, "region": [x1,y1,x2,y2]?,
 "temperature"?, "top_p"?, "max_new_tokens"?} ->
{"status", "task"?, "text", "image"/"mask"/"video" (base64)?}.
GET /health reports registered backends.

Pipelined: connections are handled on threads (ThreadingHTTPServer); each
request's host preprocessing runs in the ServingPipeline worker pool while
ONE device thread serializes MLLM/backend programs — request N+1's
decode/resize overlaps the device generating for N
(runtime/pipeline.py::ServingPipeline; the reference runs both phases
serially on its Gradio callback thread, SURVEY §3.1).
"""
from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np


def _decode_image(b64: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB"))


def _encode_image(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _encode_result(result: Dict[str, Any]) -> Dict[str, Any]:
    out = {"status": result.get("status"), "task": result.get("task"),
           "text": result.get("text", "")}
    if result.get("reply"):
        out["raw"] = result["reply"]["raw"]
    if result.get("image") is not None:
        out["image"] = _encode_image(result["image"])
    if result.get("mask") is not None:
        out["mask"] = _encode_image(result["mask"].astype(np.uint8) * 255)
    if result.get("masks") is not None:
        out["masks"] = [_encode_image(m.astype(np.uint8) * 255)
                        for m in result["masks"]]
    if result.get("video") is not None:
        out["video_frames"] = [_encode_image(f) for f in result["video"]]
    if result.get("error"):
        out["error"] = result["error"]
    return out


_INDEX_HTML = """<!doctype html>
<html><head><title>vitron-tpu</title><style>
body{font-family:sans-serif;max-width:760px;margin:2em auto;padding:0 1em}
textarea,input{width:100%;margin:.3em 0}#out{white-space:pre-wrap;
background:#f6f6f6;padding:1em;border-radius:6px}img{max-width:100%}
</style></head><body>
<h2>vitron-tpu</h2>
<p>Unified pixel-level vision LLM — chat, segment, generate, edit, track.</p>
<textarea id="prompt" rows="3" placeholder="Ask something, or request a task
(segment the dog / draw a red cube at ... / make a video of ...)"></textarea>
<input type="file" id="image" accept="image/*">
<label><input type="checkbox" id="greedy"> greedy</label>
<button onclick="send()">Send</button>
<div id="out"></div><div id="media"></div>
<script>
async function send(){
  const out=document.getElementById('out'); out.textContent='...';
  const media=document.getElementById('media'); media.innerHTML='';
  const body={prompt:document.getElementById('prompt').value,
              greedy:document.getElementById('greedy').checked};
  const f=document.getElementById('image').files[0];
  if(f){body.image=await new Promise(r=>{const fr=new FileReader();
    fr.onload=()=>r(fr.result.split(',')[1]);fr.readAsDataURL(f);});}
  const resp=await fetch('/chat',{method:'POST',
    headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
  const j=await resp.json();
  out.textContent=JSON.stringify({status:j.status,task:j.task,text:j.text||j.raw,
                                  error:j.error},null,2);
  for(const k of ['image','mask']) if(j[k])
    media.innerHTML+=`<img src="data:image/png;base64,${j[k]}">`;
  if(j.video_frames) for(const fimg of j.video_frames)
    media.innerHTML+=`<img src="data:image/png;base64,${fimg}" width=160>`;
}
</script></body></html>"""


def make_handler(system, pipeline=None):
    from vitron_tpu.runtime.generation import SamplingConfig
    from vitron_tpu.runtime.pipeline import ServingPipeline

    if pipeline is None:
        pipeline = ServingPipeline(system)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok",
                                 "backends": system.registry.available()})
            elif self.path == "/stats":
                from vitron_tpu.runtime import telemetry

                plan = system.memory_plan
                self._send(200, {
                    "backends": system.registry.available(),
                    "resident_bytes": plan.resident_bytes,
                    "budget_bytes": plan.budget_bytes,
                    "fits": plan.fits,
                    "entries": plan.entries,
                    "report": plan.report(),
                    # compiled-program cache counts (bounded LRU per
                    # pipeline; see runtime/telemetry.py)
                    "programs": telemetry.all_stats(),
                })
            elif self.path in ("/", "/index.html"):
                body = _INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/chat":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                image = _decode_image(req["image"]) if req.get("image") else None
                video = None
                if req.get("video_frames"):
                    video = np.stack([_decode_image(f) for f in req["video_frames"]])
                sampling = SamplingConfig(
                    temperature=float(req.get("temperature", 0.2)),
                    top_p=float(req.get("top_p", 0.7)),
                    max_new_tokens=int(req.get("max_new_tokens", 1024)),
                    greedy=bool(req.get("greedy", False)))
                result = pipeline.submit(
                    req.get("prompt", ""), image=image, video=video,
                    region_box=req.get("region"), sampling=sampling).result()
                self._send(200, _encode_result(result))
            except Exception as e:  # report, don't crash the server
                self._send(500, {"status": "error", "error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(system, host: str = "127.0.0.1", port: int = 8080,
          background: bool = False) -> Optional[HTTPServer]:
    server = ThreadingHTTPServer((host, port), make_handler(system))
    if background:
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server
    print(f"vitron-tpu serving on http://{host}:{port}")
    server.serve_forever()
    return None


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Vitron-TPU HTTP server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--demo", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from vitron_tpu.apps.cli import _build_demo_system

    if not args.demo:
        print("only --demo serving is wired in this build; pass --demo")
        return 2
    serve(_build_demo_system(), args.host, args.port)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

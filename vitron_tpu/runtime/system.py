"""VitronSystem: the full multimodal assistant wired end-to-end.

Rebuilds the reference application glue (reference: app.py:89-342,456-664):
chat engine (MLLM) + backend registry (A-G) + per-task adapters. All
backends are constructed once and stay resident — the reference reloads
GLIGEN/ZeroScope/I2VGenXL/StableVideo checkpoints from disk on every
request (app.py:94-103,228,295-303,324), which dominates its latency.

Each backend is optional: the system degrades to chat-only + whatever is
registered, mirroring partial deployments.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np

from vitron_tpu.constants import VISION_IMAGE_SIZE
from vitron_tpu.mm.tokenization import preprocess_region
from vitron_tpu.runtime.engine import MediaItem, VitronEngine
from vitron_tpu.runtime.generation import SamplingConfig
from vitron_tpu.runtime.router import (
    BackendRegistry,
    TaskRequest,
    parse_region_boxes,
    route_model_output,
)


class VitronSystem:
    def __init__(self, engine: VitronEngine, memory_plan=None):
        from vitron_tpu.runtime.memory_plan import MemoryPlan, tree_bytes

        self.engine = engine
        self.registry = BackendRegistry()
        # speech-to-text hook for audio-referred segmentation; None unless
        # configured (upstream ships its whisper load disabled too,
        # demo_code/app.py:76-77) — install any object with
        # .transcribe(audio) -> {"text": str}
        from vitron_tpu.media.asr import default_asr
        self.asr = default_asr()
        # resident-weights placement ledger (the reference reloads backends
        # from disk per request instead, app.py:94-103)
        self.memory_plan = memory_plan or MemoryPlan()
        llm_params = getattr(getattr(engine, "generator", None), "params", None)
        self.memory_plan.add("llm+towers",
                             tree_bytes(llm_params) if llm_params is not None else 0)

    def _track(self, name: str, params) -> None:
        from vitron_tpu.runtime.memory_plan import tree_bytes

        self.memory_plan.add(name, tree_bytes(params))

    # ------------------------------------------------------- registration

    def register_seem(self, seem_params, seem_cfg, tokenizer,
                      compute_dtype: str = "float32"):
        """B image_segmentation, E video_tracking, and the mask half of
        C image_editing (app.py:114-155,158-212,243-273).

        compute_dtype="bfloat16" serves the backbone + pixel decoder in
        bf16 (weights cast once here; decoder/language stay f32)."""
        import dataclasses as _dc

        import jax
        import jax.numpy as jnp

        from vitron_tpu.models.seem import decoder as seem_dec
        from vitron_tpu.models.seem import language as seem_lang
        from vitron_tpu.models.seem import model as seem_model

        if compute_dtype != "float32":
            seem_cfg = _dc.replace(seem_cfg, compute_dtype=compute_dtype)
            seem_params = seem_model.cast_tower_params(
                seem_params, jnp.dtype(compute_dtype))

        # jitted per-task programs (params as traced args, cfg static): the
        # bare model functions run EAGERLY otherwise, and on the
        # tunnel-attached TPU every eager op costs ~33 ms of dispatch —
        # a single un-jitted segment_text took seconds instead of ~84 ms
        size = seem_cfg.input_size

        @jax.jit
        def _jit_text(params, image, ids, mask_tok):
            img = jax.image.resize(image.astype(jnp.float32),
                                   (size, size, 3), method="linear")
            return seem_model.segment_text(params, seem_cfg,
                                           img.astype(jnp.uint8), ids,
                                           mask_tok)[0]

        @jax.jit
        def _jit_stroke(params, image, pts, valid):
            img = jax.image.resize(image.astype(jnp.float32),
                                   (size, size, 3), method="linear")
            return seem_model.segment_stroke(params, seem_cfg,
                                             img.astype(jnp.uint8), pts,
                                             valid)[0]

        @jax.jit
        def _jit_audio(params, image, ids, mask_tok):
            img = jax.image.resize(image.astype(jnp.float32),
                                   (size, size, 3), method="linear")
            return seem_model.segment_audio(params, seem_cfg,
                                            img.astype(jnp.uint8), ids,
                                            mask_tok)[0]

        @jax.jit
        def _jit_panoptic(params, image, bank):
            img = jax.image.resize(image.astype(jnp.float32),
                                   (size, size, 3), method="linear")
            logits, masks = seem_model.segment_panoptic(
                params, seem_cfg, img.astype(jnp.uint8), bank)
            masks = jax.image.resize(masks, (masks.shape[0], size, size),
                                     method="linear")
            return logits, masks

        _bank_cache: list = []

        def _class_bank():
            """COCO-134 class bank (133 classes + 'background' no-object row),
            pre-embedded once like demo_code/app.py:69-71."""
            if not _bank_cache:
                from vitron_tpu.models.seem.postprocess import COCO_PANOPTIC_CLASSES
                ids, n_t = seem_lang.class_prompt_ids(
                    tokenizer, list(COCO_PANOPTIC_CLASSES) + ["background"],
                    seem_cfg.lang)
                bank = jax.jit(seem_lang.class_embeddings_from_ids,
                               static_argnums=(1, 3))(
                    seem_params["lang"], seem_cfg.lang, jnp.asarray(ids), n_t)
                _bank_cache.append(np.asarray(bank))
            return _bank_cache[0]

        @jax.jit
        def _jit_track(params, frames, pts, valid):
            fr = jax.image.resize(frames.astype(jnp.float32),
                                  (frames.shape[0], size, size, 3),
                                  method="linear").astype(jnp.uint8)
            return seem_model.track_video(params, seem_cfg, fr, fr[0],
                                          pts, valid)

        def _text_mask(image: np.ndarray, phrase: str) -> np.ndarray:
            ids = seem_lang.tokenize(tokenizer, [phrase], seem_cfg.lang.context_length)
            mask_tok = (np.asarray(ids) != 0).astype(np.int64)
            mask = _jit_text(seem_params, jnp.asarray(image, jnp.float32),
                             jnp.asarray(ids), jnp.asarray(mask_tok))
            up = seem_model.upsample_mask(mask, image.shape[:2])
            return np.asarray(up)

        self._seem_text_mask = _text_mask
        self._track("seem", seem_params)

        def _annotated(image, mask, label):
            """Annotated composite like the reference's Visualizer output
            (tasks/visualizer.py draw_binary_mask + class text)."""
            from vitron_tpu.media import visualize as vz
            img = np.asarray(image)
            if img.dtype != np.uint8:
                img = np.clip(img, 0, 255).astype(np.uint8)
            return vz.draw_binary_mask(img, np.asarray(mask),
                                       color=vz.COLORS[0], text=label,
                                       alpha=0.5)

        def handle_b(req: TaskRequest) -> Dict[str, Any]:
            if req.image is None:
                return {"status": "error", "error": "image_segmentation needs an image"}
            if req.extra.get("audio") is not None and \
                    not req.extra.get("audio_transcript"):
                # raw audio (path or 16 kHz waveform) -> transcript via the
                # installed ASR hook (reference interactive.py:105-109 runs
                # whisper here; we keep it host-side + injectable)
                if self.asr is None:
                    return {"status": "error",
                            "error": "audio input but no ASR hook installed "
                                     "(set VITRON_WHISPER or system.asr)"}
                req.extra["audio_transcript"] = \
                    self.asr.transcribe(req.extra["audio"])["text"]
            if req.sketch_mask is not None:
                stroke = np.asarray(
                    jax.image.resize(jnp.asarray(req.sketch_mask, jnp.float32),
                                     (size, size), method="linear")) > 0.5
                pts, valid = seem_dec.sample_stroke_points(
                    stroke, seem_cfg.decoder.max_spatial_len, np.random.RandomState(0))
                mask = _jit_stroke(seem_params,
                                   jnp.asarray(req.image, jnp.float32),
                                   jnp.asarray(pts), jnp.asarray(valid))
                up = np.asarray(seem_model.upsample_mask(mask, req.image.shape[:2]))
                return {"mask": up, "overlay": _annotated(req.image, up, None)}
            if req.extra.get("audio_transcript"):
                # audio-referred segmentation (interactive.py:105-109):
                # the host transcribes speech (the reference's Whisper hook,
                # demo_code/app.py:74-77) and the transcript routes through
                # the decoder's AUDIO token group
                ids = seem_lang.tokenize(tokenizer,
                                         [req.extra["audio_transcript"]],
                                         seem_cfg.lang.context_length)
                mask_tok = (np.asarray(ids) != 0).astype(np.int64)
                mask = _jit_audio(seem_params,
                                  jnp.asarray(req.image, jnp.float32),
                                  jnp.asarray(ids), jnp.asarray(mask_tok))
                up = np.asarray(seem_model.upsample_mask(mask, req.image.shape[:2]))
                return {"mask": up,
                        "transcript": req.extra["audio_transcript"],
                        "overlay": _annotated(req.image, up,
                                              req.extra["audio_transcript"])}
            phrase = ((req.instructions or [req.text or ""])[0] or "").strip()
            if not phrase:
                # 'segment all': empty referring text and no stroke runs the
                # panoptic pass (app.py:131-136 task=[])
                from vitron_tpu.media import visualize as vz
                from vitron_tpu.models.seem import postprocess as pp

                logits, masks = _jit_panoptic(
                    seem_params, jnp.asarray(req.image, jnp.float32),
                    jnp.asarray(_class_bank()))
                pan, segments = pp.panoptic_inference(
                    np.asarray(logits), np.asarray(masks), pp.COCO_THING_IDS)
                h, w = req.image.shape[:2]
                yi = (np.arange(h) * pan.shape[0]) // h
                xi = (np.arange(w) * pan.shape[1]) // w
                pan_up = pan[yi[:, None], xi[None, :]]
                img8 = np.clip(np.asarray(req.image), 0, 255).astype(np.uint8)
                overlay, labels = vz.draw_panoptic(
                    img8, pan_up, segments,
                    class_names=pp.COCO_PANOPTIC_CLASSES)
                return {"panoptic": pan_up, "segments": segments,
                        "labels": labels, "overlay": overlay}
            m = _text_mask(req.image, phrase)
            return {"mask": m, "overlay": _annotated(req.image, m, phrase)}

        def handle_e(req: TaskRequest) -> Dict[str, Any]:
            if req.video is None or req.sketch_mask is None:
                return {"status": "error",
                        "error": "video_tracking needs a video and a stroke"}
            frames = jnp.asarray(np.stack([np.asarray(f) for f in req.video]),
                                 jnp.float32)
            stroke = np.asarray(
                jax.image.resize(jnp.asarray(req.sketch_mask, jnp.float32),
                                 (size, size), method="linear")) > 0.5
            pts, valid = seem_dec.sample_stroke_points(
                stroke, seem_cfg.decoder.max_spatial_len, np.random.RandomState(0))
            masks = np.asarray(_jit_track(seem_params, frames, jnp.asarray(pts),
                                          jnp.asarray(valid)))
            from vitron_tpu.media import visualize as vz
            raw = np.clip(np.asarray(frames), 0, 255).astype(np.uint8)
            return {"masks": masks,
                    "overlay_frames": vz.masks_to_video_overlay(raw, masks)}

        self.registry.register("B", handle_b)
        self.registry.register("E", handle_e)

    def register_gligen(self, pipeline):
        """A image_generation + C image_editing (app.py:89-111,158-212).
        C chains SEEM text segmentation into a GLIGEN inpaint keep-mask."""
        import jax.numpy as jnp

        self._track("gligen", pipeline.__dict__)

        def handle_a(req: TaskRequest) -> Dict[str, Any]:
            prompt = (req.instructions or [req.text])[0]
            boxes = parse_region_boxes(req.region)
            if boxes:
                # protocol-supplied grounding boxes (extension: the reference
                # A path ignores regions entirely); extra instruction lines
                # become the per-box phrases
                norm = [[min(max(v, 0.0), 1.0) for v in b] for b in boxes]
                phrases = (req.instructions[1:] if req.instructions and
                           len(req.instructions) > 1 else [prompt] * len(norm))
                img = pipeline.generate(prompt, norm, phrases[: len(norm)],
                                        guidance_scale=7.5)
            else:
                # the reference's exact instruction dict: no grounding boxes,
                # phrases=['placeholder'], gs 7.5, fixed seed
                # (app.py:105-107)
                img = pipeline.generate(prompt, [], ["placeholder"],
                                        guidance_scale=7.5)
            return {"image": np.asarray(img)}

        def handle_c(req: TaskRequest) -> Dict[str, Any]:
            if req.image is None:
                return {"status": "error", "error": "image_editing needs an image"}
            import jax

            from vitron_tpu.mm.sketch import mask_to_bbox

            prompt = (req.instructions or [req.text])[0]
            # the reference splits the single edit instruction on ';' into
            # per-object phrases (app.py:171-173)
            texts = [x.strip() for x in prompt.split(";") if x.strip()] or [prompt]
            h, w = req.image.shape[:2]
            lat = pipeline.cfg.latent_size
            keep = None
            if req.sketch_mask is not None and np.asarray(req.sketch_mask).any():
                # user-drawn region: bbox from the sketch, GLIGEN draws the
                # inpaint mask from the box (app.py:195-210)
                bb = mask_to_bbox(np.asarray(req.sketch_mask, bool))
                norm = [[bb[0] / w, bb[1] / h, bb[2] / w, bb[3] / h]]
                phrases = texts[:1]
                gy, gx = np.mgrid[0:lat, 0:lat]
                inbox = ((gx >= norm[0][0] * lat) & (gx < norm[0][2] * lat) &
                         (gy >= norm[0][1] * lat) & (gy < norm[0][3] * lat))
                keep = (~inbox).astype(np.float32)
            elif parse_region_boxes(req.region):
                # the LLM emitted explicit <region> boxes with the C call:
                # honor them over re-deriving boxes from SEEM (the reference
                # uses the parsed region list directly when present)
                boxes = parse_region_boxes(req.region)
                norm = [[min(max(v, 0.0), 1.0) for v in b] for b in boxes]
                phrases = texts[: len(norm)] or [prompt]
                gy, gx = np.mgrid[0:lat, 0:lat]
                outside = np.ones((lat, lat), bool)
                for b in norm:
                    inbox = ((gx >= b[0] * lat) & (gx < b[2] * lat) &
                             (gy >= b[1] * lat) & (gy < b[3] * lat))
                    outside &= ~inbox
                keep = outside.astype(np.float32)
            elif hasattr(self, "_seem_text_mask"):
                # no sketch: per-phrase SEEM text segmentation, masks merged
                # with logical_or, boxes from each mask (app.py:176-186)
                merged = np.zeros((h, w), bool)
                norm, phrases = [], []
                for t in texts:
                    seg = self._seem_text_mask(req.image, t)
                    merged |= seg.astype(bool)
                    bb = mask_to_bbox(seg.astype(bool))
                    if bb is not None:
                        norm.append([bb[0] / w, bb[1] / h, bb[2] / w, bb[3] / h])
                        phrases.append(t)
                if not norm:
                    norm, phrases = [[0.25, 0.25, 0.75, 0.75]], texts[:1]
                small = np.asarray(jax.image.resize(
                    jnp.asarray(merged, jnp.float32), (lat, lat),
                    method="linear"))
                keep = (small < 0.5).astype(np.float32)  # keep outside objects
            else:
                boxes = parse_region_boxes(req.region)
                norm = ([[min(max(v, 0.0), 1.0) for v in b] for b in boxes]
                        or [[0.25, 0.25, 0.75, 0.75]])
                phrases = texts[: len(norm)] or [prompt]
            img = pipeline.generate(
                prompt, norm, phrases,
                guidance_scale=30.0,  # inpaint guidance (app.py:189)
                inpaint_image=jnp.asarray(req.image), inpaint_keep_mask=keep)
            return {"image": np.asarray(img)}

        self.registry.register("A", handle_a)
        self.registry.register("C", handle_c)

    def register_text2video(self, pipeline):
        self._track("text2video", pipeline.__dict__)

        def handle_d(req: TaskRequest) -> Dict[str, Any]:
            prompt = (req.instructions or [req.text])[0]
            frames = pipeline.generate(prompt)
            return {"video": np.asarray(frames)}

        self.registry.register("D", handle_d)

    def register_image2video(self, pipeline):
        self._track("image2video", pipeline.__dict__)

        def handle_g(req: TaskRequest) -> Dict[str, Any]:
            if req.image is None:
                return {"status": "error", "error": "image_to_video needs an image"}
            import jax.numpy as jnp

            prompt = (req.instructions or [req.text])[0]
            frames = pipeline.generate(jnp.asarray(req.image), prompt)
            return {"video": np.asarray(frames)}

        self.registry.register("G", handle_g)

    def register_video_editor(self, editor, atlas_provider=None,
                              num_keyframes: int = 3):
        """F video_editing (app.py:276-313 + StableVideo/app.py:79-280):
        instruction[0] edits the foreground (per-keyframe canny ControlNet
        with atlas propagation, scatter + median aggregation), instruction[1]
        edits the background (depth ControlNet when the editor carries a
        depth annotator, canny otherwise); both atlases re-render with the
        per-frame UVs. `atlas_provider(video, extra)` must return the
        precomputed atlas bundle (the reference expects per-video NLA
        checkpoints, StableVideo/app.py:67-76)."""
        self._track("video_editor", editor.__dict__)
        import jax.numpy as jnp

        from vitron_tpu.models.diffusion import stablevideo as sv

        def handle_f(req: TaskRequest) -> Dict[str, Any]:
            if atlas_provider is None:
                return {"status": "error",
                        "error": "video_editing needs precomputed atlases"}
            instructions = req.instructions or [req.text]
            fore_prompt = instructions[0]
            back_prompt = instructions[1] if len(instructions) > 1 else ""
            atlas = atlas_provider(req.video, req.extra)
            fg_atlas = jnp.asarray(atlas["fg_atlas"])   # [Ha, Wa, 3] in [0,1]
            bg_atlas = jnp.asarray(atlas["bg_atlas"])
            fg_uv = np.asarray(atlas["fg_uv"])          # [T, H, W, 2]
            alpha = np.asarray(atlas["alpha"])          # [T, H, W, 1]
            t_frames = fg_uv.shape[0]

            # ---- foreground (advanced_edit_foreground, app.py:143-280)
            if fore_prompt:
                idxs = sorted(set(np.linspace(
                    0, t_frames - 1, min(num_keyframes, t_frames)).astype(int)))
                kfs, uvs, alphas = [], [], []
                for k in idxs:
                    crop = sv.grid_sample_bilinear(fg_atlas, jnp.asarray(fg_uv[k]))
                    crop = np.asarray(jnp.clip(crop, 0, 1) * 255).astype(np.uint8)
                    kfs.append(crop)
                    uvs.append(fg_uv[k])
                    alphas.append(alpha[k])
                fg_edited = jnp.asarray(sv.advanced_edit_foreground(
                    editor, kfs, uvs, alphas, fg_atlas.shape[:2], fore_prompt))
            else:
                fg_edited = fg_atlas

            # ---- background: depth ControlNet (app.py:79-139)
            if back_prompt:
                bg_u8 = np.asarray(jnp.clip(bg_atlas, 0, 1) * 255).astype(np.uint8)
                if editor.depth_annotator is not None:
                    dparams, dcfg = editor.depth_annotator
                    hint = sv.depth_hint(dparams, dcfg, bg_u8)
                    ctrl = "depth"
                else:
                    hint = sv.canny_hint(bg_u8)
                    ctrl = "canny"
                edited = editor.edit_image(
                    jnp.asarray(bg_u8), jnp.asarray(hint), back_prompt,
                    control=ctrl)
                bg_edited = jnp.asarray(edited, jnp.float32) / 255.0
            else:
                bg_edited = bg_atlas

            frames = sv.render_frames(
                fg_edited, bg_edited, jnp.asarray(fg_uv),
                jnp.asarray(atlas["bg_uv"]), jnp.asarray(alpha))
            return {"video": np.asarray(jnp.clip(frames, 0, 1) * 255).astype(np.uint8)}

        self.registry.register("F", handle_f)

    # ------------------------------------------------------------- chat

    def prepare(self, user_message: str, image: Optional[np.ndarray] = None,
                video: Optional[np.ndarray] = None,
                region_box: Optional[list] = None) -> Dict[str, Any]:
        """Host half of a turn: media preprocessing + prompt assembly.

        Runs in worker threads (runtime/pipeline.py ServingPipeline) so the
        next request's decode/resize overlaps the device generating for the
        current one — the reference does all of this serially on the chat
        thread (SURVEY §3.1 'CPU hot loop')."""
        from vitron_tpu.media.preprocess import preprocess_image, preprocess_video

        tower_size = self.engine.generator.cfg.image_tower.image_size
        media = []
        msg = user_message
        if image is not None:
            import jax.numpy as jnp

            px = np.asarray(preprocess_image(jnp.asarray(image), size=tower_size))
            media.append(MediaItem("image", px))
            if "<image>" not in msg:
                msg = "<image>\n" + msg
        if video is not None:
            import jax.numpy as jnp

            nf = self.engine.generator.cfg.video_tower.num_frames
            px = np.asarray(preprocess_video(jnp.asarray(video[:nf]), size=tower_size))
            media.append(MediaItem("video", px))
            if "<image>" not in msg and "<video>" not in msg:
                msg = "<image>" * px.shape[0] + "\n" + msg

        region_boxes = None
        if region_box is not None and image is not None:
            scaled = preprocess_region(region_box, image.shape[:2][::-1],
                                       (tower_size, tower_size))
            region_boxes = np.asarray([scaled], np.float32)
            if "<objs>" not in msg:
                msg = msg + " <objs>"
        return {"msg": msg, "media": media, "region_boxes": region_boxes,
                "image": image, "video": video}

    def chat_prepared(self, prepared: Dict[str, Any],
                      sketch_mask: Optional[np.ndarray] = None,
                      history=None, sampling: SamplingConfig = SamplingConfig(),
                      rng=None,
                      extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Device half: MLLM generate + protocol routing on a prepared
        request."""
        reply = self.engine.chat(prepared["msg"], media=prepared["media"],
                                 region_boxes=prepared["region_boxes"],
                                 history=history, sampling=sampling, rng=rng)
        result = route_model_output(
            self.registry, reply["raw"], image=prepared["image"],
            video=prepared["video"], sketch_mask=sketch_mask, extra=extra)
        result["reply"] = reply
        return result

    def chat(self, user_message: str, image: Optional[np.ndarray] = None,
             video: Optional[np.ndarray] = None,
             sketch_mask: Optional[np.ndarray] = None,
             region_box: Optional[list] = None,
             history=None, sampling: SamplingConfig = SamplingConfig(),
             rng=None, extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """One turn: preprocess media, run the MLLM, route any tool call
        (predict(), app.py:456-664). Serial convenience wrapper over
        prepare() + chat_prepared(); serve.py pipelines the two halves."""
        prepared = self.prepare(user_message, image=image, video=video,
                                region_box=region_box)
        return self.chat_prepared(prepared, sketch_mask=sketch_mask,
                                  history=history, sampling=sampling, rng=rng,
                                  extra=extra)

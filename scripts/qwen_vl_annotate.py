"""Annotate WebVid clips for quality/content with Qwen2.5-VL to build the
"filtered" video list (reference scripts/qwen_vl_annotate.py).

Requires the `transformers` Qwen2.5-VL weights (network download);
produces `{subpath} {framecount}` lines for clips judged usable.

Usage: python scripts/qwen_vl_annotate.py <webvid_root> <video_list.txt> <out_list.txt>
"""
import json
import os
import sys

PROMPT = ("Rate this video for training an event-camera simulator. "
          "Answer JSON {\"quality\": 1-5, \"static\": bool, "
          "\"has_watermark_overlay\": bool}. Quality reflects sharpness, "
          "lighting and motion diversity.")


def main(root: str, list_file: str, out_file: str,
         min_quality: int = 3) -> None:
    try:
        import torch
        from transformers import (AutoProcessor,
                                  Qwen2_5_VLForConditionalGeneration)
        # decodes the video messages into frame tensors for the
        # processor (reference scripts/qwen_vl_annotate.py:7,57)
        from qwen_vl_utils import process_vision_info
    except ImportError as e:
        raise SystemExit(
            f"qwen annotation needs transformers with Qwen2.5-VL "
            f"and qwen-vl-utils: {e}")
    model_name = os.environ.get("QWEN_VL_MODEL",
                                "Qwen/Qwen2.5-VL-7B-Instruct")
    model = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        model_name, torch_dtype="auto", device_map="auto")
    processor = AutoProcessor.from_pretrained(model_name)

    kept = []
    with open(list_file) as f:
        entries = [l.split() for l in f if l.strip()]
    for subpath, framecount, *rest in entries:
        messages = [{"role": "user", "content": [
            {"type": "video", "video": os.path.join(root, subpath)},
            {"type": "text", "text": PROMPT}]}]
        text = processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
        _, video_inputs = process_vision_info(messages)
        inputs = processor(text=[text], videos=video_inputs,
                           return_tensors="pt", padding=True)
        out = model.generate(**inputs.to(model.device), max_new_tokens=64)
        reply = processor.batch_decode(out, skip_special_tokens=True)[-1]
        try:
            verdict = json.loads(reply[reply.index("{"):reply.rindex("}") + 1])
        except Exception:
            continue
        if (verdict.get("quality", 0) >= min_quality
                and not verdict.get("static", False)):
            kept.append(f"{subpath} {framecount}")
        print(subpath, "->", reply.strip()[:80])
    with open(out_file, "w") as f:
        f.write("\n".join(kept) + "\n")
    print(f"kept {len(kept)}/{len(entries)} clips -> {out_file}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])

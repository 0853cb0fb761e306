#!/usr/bin/env python3
"""Generate the downstream task-config catalog.

Mirrors the benchmark/task matrix of the reference's
config/vast/finetune_cfg + pretrain_cfg + captioner_cfg (25 JSONs): same
schema, same task strings / sample counts / batch sizes / epochs; dataset
paths point at $VAST_DATA (default ./datasets) so runs work from any
checkout. Regenerate with ``python -m vast_tpu.configs.generate_task_configs``.
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = "${VAST_DATA:-datasets}"

# name -> (head, subtask, vision_format, train kwargs, val kwargs, model_cfg)
# (task matrix mirrors config/vast/finetune_cfg/*.json)
FINETUNE = {
    "retrieval-msrvtt": ("ret%tvas", "video_rawvideo",
                         dict(vision_sample_num=8, audio_sample_num=1,
                              batch_size=64, epoch=3.6,
                              vision_transforms="crop_flip"),
                         dict(vision_sample_num=16, audio_sample_num=1,
                              batch_size=64,
                              vision_transforms="crop_flip"), {}),
    "retrieval-flickr": ("ret%tv", "image_rawimage",
                         dict(batch_size=256, epoch=5),
                         dict(batch_size=128), {}),
    "retrieval-mscoco": ("ret%tv", "image_rawimage",
                         dict(batch_size=256, epoch=5),
                         dict(batch_size=128), {}),
    "retrieval-didemo": ("ret%tva", "video_rawvideo",
                         dict(vision_sample_num=8, audio_sample_num=2,
                              batch_size=64, epoch=40),
                         dict(vision_sample_num=32, audio_sample_num=2,
                              batch_size=64), {"max_caption_len": 70}),
    "retrieval-activitynet": ("ret%tva", "video_rawvideo",
                              dict(vision_sample_num=8, audio_sample_num=2,
                                   batch_size=64, epoch=20),
                              dict(vision_sample_num=32, audio_sample_num=2,
                                   batch_size=64), {"max_caption_len": 70}),
    "retrieval-vatex": ("ret%tvas", "video_rawvideo",
                        dict(vision_sample_num=8, audio_sample_num=1,
                             batch_size=64, epoch=2.5),
                        dict(vision_sample_num=16, audio_sample_num=1,
                             batch_size=64), {}),
    "retrieval-youcook": ("ret%tvas", "video_rawvideo",
                          dict(vision_sample_num=8, audio_sample_num=1,
                               batch_size=64, epoch=30),
                          dict(vision_sample_num=16, audio_sample_num=1,
                               batch_size=64), {}),
    "retrieval-lsmdc": ("ret%tva", "video_rawvideo",
                        dict(vision_sample_num=8, audio_sample_num=1,
                             batch_size=64, epoch=5),
                        dict(vision_sample_num=32, audio_sample_num=1,
                             batch_size=64), {}),
    "retrieval-valor32k": ("ret%tva", "video_rawvideo",
                           dict(vision_sample_num=8, audio_sample_num=1,
                                batch_size=64, epoch=30),
                           dict(vision_sample_num=8, audio_sample_num=1,
                                batch_size=64), {}),
    "retrieval-audiocaps": ("ret%ta", None,
                            dict(audio_sample_num=1, batch_size=64, epoch=10),
                            dict(audio_sample_num=1, batch_size=64), {}),
    "retrieval-clothov2": ("ret%ta", None,
                           dict(audio_sample_num=3, batch_size=64, epoch=10),
                           dict(audio_sample_num=3, batch_size=64), {}),
    "caption-msrvtt": ("cap%tvas", "video_rawvideo",
                       dict(vision_sample_num=8, audio_sample_num=1,
                            batch_size=64, epoch=5,
                            vision_transforms="crop_flip"),
                       dict(vision_sample_num=16, audio_sample_num=1,
                            batch_size=64, vision_transforms="crop_flip"),
                       {}),
    "caption-msvd": ("cap%tv", "video_rawvideo",
                     dict(vision_sample_num=8, batch_size=64, epoch=2.5),
                     dict(vision_sample_num=8, batch_size=64), {}),
    "caption-mscoco": ("cap%tv", "image_rawimage",
                       dict(batch_size=64, epoch=5),
                       dict(batch_size=128), {}),
    "caption-vatex": ("cap%tvas", "video_rawvideo",
                      dict(vision_sample_num=8, audio_sample_num=1,
                           batch_size=64, epoch=10),
                      dict(vision_sample_num=20, audio_sample_num=1,
                           batch_size=64), {}),
    "caption-youcook": ("cap%tvas", "video_rawvideo",
                        dict(vision_sample_num=8, audio_sample_num=1,
                             batch_size=64, epoch=30),
                        dict(vision_sample_num=16, audio_sample_num=1,
                             batch_size=64), {}),
    "caption-tv": ("cap%tv", "video_frame",
                   dict(vision_sample_num=8, batch_size=64, epoch=20),
                   dict(vision_sample_num=8, batch_size=64), {}),
    "caption-valor32k": ("cap%tva", "video_rawvideo",
                         dict(vision_sample_num=8, audio_sample_num=1,
                              batch_size=64, epoch=30),
                         dict(vision_sample_num=8, audio_sample_num=1,
                              batch_size=64), {}),
    "caption-audiocaps": ("cap%ta", None,
                          dict(audio_sample_num=1, batch_size=64, epoch=10),
                          dict(audio_sample_num=1, batch_size=64), {}),
    "caption-clothov2": ("cap%ta", None,
                         dict(audio_sample_num=3, batch_size=64, epoch=10),
                         dict(audio_sample_num=3, batch_size=64), {}),
    "VQA-msrvtt": ("qa%tvas", "video_rawvideo",
                   dict(vision_sample_num=8, audio_sample_num=1,
                        batch_size=64, epoch=4.5,
                        vision_transforms="crop_flip"),
                   dict(vision_sample_num=8, audio_sample_num=1,
                        batch_size=8, vision_transforms="crop_flip"), {}),
    "VQA-msvd": ("qa%tv", "video_rawvideo",
                 dict(vision_sample_num=8, batch_size=64, epoch=10),
                 dict(vision_sample_num=8, batch_size=8), {}),
    "VQA-tgif": ("qa%tv", "video_rawvideo",
                 dict(vision_sample_num=4, batch_size=64, epoch=10),
                 dict(vision_sample_num=4, batch_size=8), {}),
    "VQA-music": ("qa%tva", "video_rawvideo",
                  dict(vision_sample_num=8, audio_sample_num=2,
                       batch_size=64, epoch=4.5),
                  dict(vision_sample_num=8, audio_sample_num=2,
                       batch_size=8), {}),
    "VQA-activitynet": ("qa%tva", "video_rawvideo",
                        dict(vision_sample_num=8, audio_sample_num=2,
                             batch_size=64, epoch=10),
                        dict(vision_sample_num=16, audio_sample_num=2,
                             batch_size=8), {}),
    "VQA-vqav2": ("qa%tv", "image_rawimage",
                  dict(batch_size=128, epoch=20),
                  dict(batch_size=64), {}),
}

DATASET_DIRS = {
    "msrvtt": "msrvtt", "flickr": "flickr30k", "mscoco": "mscoco",
    "didemo": "didemo", "activitynet": "activitynet", "vatex": "vatex",
    "youcook": "youcook2", "lsmdc": "lsmdc", "valor32k": "valor32k",
    "audiocaps": "audiocaps", "clothov2": "clothov2", "msvd": "msvd",
    "tgif": "tgif", "music": "music_avqa", "tv": "tvc", "vqav2": "vqav2",
}


def dataset_entry(name: str, task: str, vision_format, training: bool, kw,
                  head: str):
    dset = DATASET_DIRS[name.split("-")[-1].lower()]
    base = f"{DATA}/{dset}"
    split = "train" if training else "test"
    entry = {
        "type": "annoindexed",
        "training": training,
        "name": name.replace("-", "_"),
        "txt": f"{base}/annotations/{head}_{split}.json",
        "task": task,
        "n_workers": 8,
        **kw,
    }
    if vision_format:
        entry["vision"] = (f"{base}/videos" if "video" in vision_format
                           else f"{base}/images")
        entry["vision_format"] = vision_format
        if vision_format == "video_rawvideo":
            # TPU-first wire default: packed YUV420 halves host->device
            # frame bytes and decodes ~1.2x faster (data/vision.py);
            # loaders fall back to rgb when the native runtime is absent
            entry["pixel_format"] = "yuv420"
    if "audio_sample_num" in kw:
        entry["audio"] = f"{base}/audios"
    if not training and head in ("cap",):
        entry["annfile"] = f"{base}/annotations/cap_test_coco.json"
    return entry


def main():
    for sub in ("finetune_cfg", "pretrain_cfg", "captioner_cfg"):
        os.makedirs(os.path.join(HERE, sub), exist_ok=True)

    for name, (task, vfmt, train_kw, val_kw, model_over) in FINETUNE.items():
        head = task.split("%")[0].lower().replace("qa", "qa")
        cfg = {
            "run_cfg": {"default": "./config/vast/default_run_cfg.json"},
            "model_cfg": {"default": "./config/vast/default_model_cfg.json",
                          **model_over},
            "data_cfg": {
                "train": [dataset_entry(name, task, vfmt, True, train_kw,
                                        head)],
                "val": [dataset_entry(name, task, vfmt, False, val_kw, head)],
            },
        }
        with open(os.path.join(HERE, "finetune_cfg", f"{name}.json"),
                  "w") as f:
            json.dump(cfg, f, indent=2)

    # pretrain: VAST-27M-style multi-dataset mix (pretrain_vast.json)
    pretrain = {
        "run_cfg": {"default": "./config/vast/default_run_cfg.json",
                    "learning_rate": 5e-5},
        "model_cfg": {"default": "./config/vast/default_model_cfg.json",
                      "vision_encoder_type": "evaclip01_giant"},
        "data_cfg": {
            "train": [
                {"type": "annoindexed", "training": True, "name": "vast27m",
                 "txt": f"{DATA}/vast27m/annotations/train.json",
                 "vision": f"{DATA}/vast27m/videos",
                 "audio": f"{DATA}/vast27m/audios",
                 "vision_format": "video_rawvideo",
                 "pixel_format": "yuv420",
                 "vision_sample_num": 1, "audio_sample_num": 1,
                 "task": "ret%tvas%tvs%tv%ta_cap%tvas%tvs%tv%ta",
                 "steps": 60000, "n_workers": 8, "batch_size": 1024},
                {"type": "annoindexed", "training": True, "name": "valor1m",
                 "txt": f"{DATA}/valor1m/annotations/train.json",
                 "vision": f"{DATA}/valor1m/videos",
                 "audio": f"{DATA}/valor1m/audios",
                 "vision_format": "video_rawvideo",
                 "pixel_format": "yuv420",
                 "vision_sample_num": 1, "audio_sample_num": 1,
                 "task": "ret%tva%tv%ta_cap%tva%tv%ta",
                 "steps": 25000, "n_workers": 4, "batch_size": 1024},
                {"type": "srcindexed", "training": True, "name": "laion400m",
                 "txt": f"{DATA}/laion400m/shards",
                 "vision_format": "image_rawimage",
                 "pixel_format": "yuv420",
                 "vision_sample_num": 1,
                 "task": "ret%tv_cap%tv",
                 "steps": 15000, "n_workers": 8, "batch_size": 2048},
            ],
            "val": [dataset_entry("retrieval-msrvtt", "ret%tvas",
                                  "video_rawvideo", False,
                                  dict(vision_sample_num=8,
                                       audio_sample_num=1, batch_size=64),
                                  "ret")],
        },
    }
    with open(os.path.join(HERE, "pretrain_cfg", "pretrain_vast.json"),
              "w") as f:
        json.dump(pretrain, f, indent=2)

    # captioner mode (vision/audio caption generation over corpora)
    for mod, task in (("vision", "cap%tv"), ("audio", "cap%ta")):
        cfg = {
            "run_cfg": {"default": "./config/vast/default_run_cfg.json",
                        "mode": "testing"},
            "model_cfg": {"default": "./config/vast/default_model_cfg.json",
                          "captioner_mode": True, "generate_nums": 3},
            "data_cfg": {"train": [], "val": [
                {"type": "annoindexed", "training": False,
                 "name": f"{mod}_corpus",
                 "txt": f"{DATA}/corpus/annotations/{mod}.json",
                 **({"vision": f"{DATA}/corpus/videos",
                     "vision_format": "video_rawvideo",
                     "pixel_format": "yuv420",
                     "vision_sample_num": 8} if mod == "vision"
                    else {"audio": f"{DATA}/corpus/audios",
                          "audio_sample_num": 1}),
                 "task": task, "n_workers": 8, "batch_size": 64}]},
        }
        with open(os.path.join(
                HERE, "captioner_cfg", f"caption-generation-{mod}.json"),
                "w") as f:
            json.dump(cfg, f, indent=2)
    print(f"wrote {len(FINETUNE)} finetune + 1 pretrain + 2 captioner configs")


if __name__ == "__main__":
    main()

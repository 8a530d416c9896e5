"""CelebA dataset plugin (reference: hem/data/celeb.py).

Record schema: {'image': encoded jpg/png, 'filename': bytes,
'attributes': bytes} — attributes is the 40-way boolean vector from
list_attr_celeba.txt packed as raw bools (hem/data/celeb.py:100-124).
Parse: decode 178x218 -> resize 64x64 -> /255 (hem/data/celeb.py:131-141;
hemx stays NHWC and also surfaces the attribute vector).

Splits come from list_eval_partition.txt (0=train, 1=validate, 2=test).

Deviation: the reference's check_prepared/check_raw returned None (missing
``return``, hem/data/celeb.py:70-78), so prepare always re-ran; fixed here.
"""

from __future__ import annotations

import os

import numpy as np

from hemx.data.imageio import decode_image, resize_bilinear
from hemx.data.pipeline import Split, TFRecordSource, u8_image_device_transform
from hemx.data.plugin import DataPlugin, bytes_feature
from hemx.data.tfrecord import TFRecordWriter
from hemx.summaries import proto

_OUTPUT_FILES = {"train": "celeba.train.tfrecords",
                 "validate": "celeba.validate.tfrecords",
                 "test": "celeba.test.tfrecords"}

ATTRIBUTE_NAMES = [
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
    "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
    "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
    "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
    "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick", "Wearing_Necklace",
    "Wearing_Necktie", "Young",
]


def parse_example(record: bytes) -> dict:
    feats = proto.parse_example(record)
    img = decode_image(feats["image"]["bytes"][0], channels=3)
    img = resize_bilinear(img, 64, 64)
    attrs = np.frombuffer(feats["attributes"]["bytes"][0], np.bool_)
    return {"image": img, "attributes": attrs.astype(np.uint8)}


class CelebDataset(DataPlugin):
    name = "celeb"

    @staticmethod
    def arguments() -> dict:
        return {}

    @staticmethod
    def check_prepared_datasets(storage_dir: str) -> bool:
        return all(os.path.exists(os.path.join(storage_dir, f))
                   for f in _OUTPUT_FILES.values())

    @staticmethod
    def check_raw_datasets(storage_dir: str) -> bool:
        return (os.path.exists(os.path.join(storage_dir,
                                            "list_eval_partition.txt"))
                and os.path.exists(os.path.join(storage_dir,
                                                "list_attr_celeba.txt")))

    @staticmethod
    def download(download_dir: str) -> bool:
        raise NotImplementedError(
            "CelebA requires manual download (aligned images + "
            "list_eval_partition.txt + list_attr_celeba.txt into "
            "--raw_dataset_dir)")

    @staticmethod
    def convert_to_tfrecord(download_dir: str, storage_dir: str) -> None:
        os.makedirs(storage_dir, exist_ok=True)
        split_lists: dict[str, list[str]] = {"train": [], "validate": [],
                                             "test": []}
        split_by_code = {0: "train", 1: "validate", 2: "test"}
        with open(os.path.join(download_dir, "list_eval_partition.txt")) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    split_lists[split_by_code[int(parts[1])]].append(parts[0])

        attributes: dict[str, np.ndarray] = {}
        with open(os.path.join(download_dir, "list_attr_celeba.txt")) as f:
            for line in f.readlines()[2:]:
                d = line.strip().split()
                attributes[d[0]] = np.array([x == "1" for x in d[1:]],
                                            dtype=np.bool_)

        png_dir = os.path.join(download_dir, "img_align_celeba_png")
        jpg_dir = os.path.join(download_dir, "img_align_celeba_jpg")
        flat_dir = os.path.join(download_dir, "img_align_celeba")

        def image_path(fn: str) -> str:
            for d in ((png_dir,) if fn.endswith(".png") else (jpg_dir,)):
                p = os.path.join(d, fn)
                if os.path.exists(p):
                    return p
            return os.path.join(flat_dir, fn)

        for split, files in split_lists.items():
            out = os.path.join(storage_dir, _OUTPUT_FILES[split])
            with TFRecordWriter(out) as w:
                for fn in files:
                    with open(image_path(fn), "rb") as img_f:
                        data = img_f.read()
                    w.write(proto.example({
                        "image": bytes_feature(data),
                        "filename": bytes_feature(fn.encode()),
                        "attributes": bytes_feature(attributes[fn].tobytes()),
                    }))

    @classmethod
    def get_datasets(cls, args) -> dict:
        storage = os.path.join(args.dataset_dir, cls.name)
        splits = {}
        for split, fname in _OUTPUT_FILES.items():
            src = TFRecordSource([os.path.join(storage, fname)], parse_example)
            # no host batch_transform -> device-resident-cache eligible
            splits[split] = Split(src, name=split,
                                  device_transform=u8_image_device_transform())
        return splits

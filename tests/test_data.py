import json
import os

import numpy as np
import pytest

from transductive_clip_tpu.data import build_dataset, DATASET_REGISTRY, iter_image_batches
from transductive_clip_tpu.data.catalog import imagenet_classnames


def write_coop_split(root, split_file, n_class=3, per_split=4):
    split = {}
    for split_name in ("train", "val", "test"):
        items = []
        for c in range(n_class):
            for i in range(per_split):
                items.append([f"class{c}/img_{split_name}_{i}.jpg", c, f"class {c}"])
        split[split_name] = items
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, split_file), "w") as f:
        json.dump(split, f)


def test_registry_covers_all_11_datasets():
    assert set(DATASET_REGISTRY) == {
        "oxfordpets", "eurosat", "ucf101", "sun397", "caltech101", "dtd",
        "fgvcaircraft", "food101", "flowers102", "stanfordcars", "imagenet",
    }


def test_coop_dataset_loading(tmp_path):
    root = str(tmp_path)
    write_coop_split(root, "split_zhou_EuroSAT.json")
    ds = build_dataset("eurosat", root)
    assert ds.num_classes == 3
    assert ds.classnames == ["class 0", "class 1", "class 2"]
    assert ds.template == "a centered satellite photo of {}."
    assert len(ds.train_x) == len(ds.val) == len(ds.test) == 12
    assert ds.test[0].impath.startswith(os.path.join(root, "images"))


def test_fgvcaircraft_loading(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "variants.txt"), "w") as f:
        f.write("707-320\nA300B4\n")
    for split in ("train", "val", "test"):
        with open(os.path.join(root, f"images_variant_{split}.txt"), "w") as f:
            f.write(f"00001 707-320\n00002 A300B4\n")
    ds = build_dataset("fgvcaircraft", root)
    assert ds.classnames == ["707-320", "A300B4"]
    assert ds.template.endswith("a type of aircraft.")
    assert ds.test[0].impath.endswith("00001.jpg")


def test_imagenet_loading(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "idx_class_name.csv"), "w") as f:
        f.write("0,n01440764\n1,n01443537\n")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("n01440764/im1 0\nn01443537/im2 1\n")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("n01440764/im3 0\n")
    ds = build_dataset("imagenet", root)
    assert ds.train_x[0].classname == "tench"
    assert ds.train_x[1].classname == "goldfish"
    assert ds.test[0].impath.endswith(os.path.join("val", "n01440764", "im3.JPEG"))
    assert ds.val == []


def test_imagenet_classnames_asset():
    names = imagenet_classnames()
    assert len(names) == 1000
    assert names[0] == "tench"
    # the reference's corrupted entries are fixed (SURVEY.md quirk list)
    assert "paddle" in names and "paddle wheel" in names
    assert not any("fuzzy_kmeans" in n for n in names)


def test_iter_image_batches(tmp_path):
    from PIL import Image

    from transductive_clip_tpu.data.base import Datum
    from transductive_clip_tpu.models.clip.preprocess import make_preprocess

    data = []
    rng = np.random.default_rng(0)
    for i in range(5):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(p)
        data.append(Datum(impath=p, label=i % 2, classname=str(i % 2)))

    preprocess = make_preprocess(32)
    batches = list(iter_image_batches(data, preprocess, batch_size=2))
    assert len(batches) == 3
    images, labels = batches[0]
    assert images.shape == (2, 32, 32, 3)
    assert images.dtype == np.float32
    np.testing.assert_array_equal(labels, [0, 1])


def test_generate_fewshot_subset(rng):
    from transductive_clip_tpu.data.base import Datum, generate_fewshot_subset

    data = [Datum(impath=f"{c}_{i}.jpg", label=c, classname=str(c))
            for c in range(3) for i in range(5)]
    sub = generate_fewshot_subset(data, num_shots=2, rng=rng)
    assert len(sub) == 6
    labels = sorted(d.label for d in sub)
    assert labels == [0, 0, 1, 1, 2, 2]
    # num_shots larger than class size repeats
    sub = generate_fewshot_subset(data[:5], num_shots=8, rng=rng)
    assert len(sub) == 8

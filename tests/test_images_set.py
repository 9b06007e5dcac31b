"""images_set builder tests (C3 tail)."""

from eeg_image_decode_tpu.preprocess.images_set import (
    build_images_set,
    concept_folder_name,
)


def test_concept_folder_name():
    assert concept_folder_name(7, "aardvark") == "00007_aardvark"


def test_build_images_set_routing(tmp_path):
    paths = [
        "images/aardvark/a1.jpg",   # event 1 → train
        "images/aardvark/a2.jpg",   # event 2 → test
        "images/zebra/z1.jpg",      # event 3 → neither
    ]
    concepts = [1, 1, 2]
    copies = []
    counts = build_images_set(
        paths, concepts, train_event_ids=[1], test_event_ids=[2],
        origin_dir="/src", out_dir=str(tmp_path),
        copy_fn=lambda s, d: copies.append((s, d)),
    )
    assert counts == {"training": 1, "test": 1, "skipped": 1}
    assert copies[0][0] == "/src/images/aardvark/a1.jpg"
    assert copies[0][1].endswith(
        "training_images/images/00001_aardvark/a1.jpg"
    )
    assert copies[1][1].endswith("test_images/images/00001_aardvark/a2.jpg")

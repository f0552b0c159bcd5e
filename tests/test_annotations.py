import pathlib

from bdvcil_tpu.data.annotations import (
    VideoRecord,
    accumulate_task_sizes,
    build_label_remap,
    generate_task_annotation_files,
    read_annotation_file,
    split_annotations_by_task,
    write_annotation_file,
)


def test_remap_first_seen_order():
    splits = [[37, 97, 56], [98, 96], [31, 95]]
    remap = build_label_remap(splits)
    assert remap == {37: 0, 97: 1, 56: 2, 98: 3, 96: 4, 31: 5, 95: 6}


def test_accumulate_sizes():
    assert accumulate_task_sizes([[1, 2, 3], [4], [5, 6]]) == [3, 4, 6]


def test_split_and_remap():
    records = [
        VideoRecord("a", 10, 97),
        VideoRecord("b", 12, 98),
        VideoRecord("c", 9, 37),
        VideoRecord("d", 9, 31),
    ]
    splits = [[37, 97], [98], [31]]
    per_task = split_annotations_by_task(records, splits)
    assert [r.frame_dir for r in per_task[0]] == ["a", "c"]
    assert [r.label for r in per_task[0]] == [1, 0]
    assert per_task[1][0].label == 2
    assert per_task[2][0].label == 3


def test_roundtrip_and_generate(tmp_path):
    records = [VideoRecord("x/y", 30, 5), VideoRecord("z", 8, 2)]
    path = tmp_path / "ann.txt"
    write_annotation_file(path, records)
    assert read_annotation_file(path) == records

    train = tmp_path / "train.txt"
    val = tmp_path / "val.txt"
    write_annotation_file(train, [VideoRecord("a", 5, 0), VideoRecord("b", 5, 1)])
    write_annotation_file(val, [VideoRecord("c", 5, 1)])
    out = generate_task_annotation_files(
        str(train), str(val), [[0], [1]], tmp_path / "splits", write_oracle=True
    )
    assert len(out["train"]) == 2
    # task 0 val has no class-0 samples -> no file written
    assert len(out["val"]) == 1
    oracle1 = read_annotation_file(out["train_oracle"][1])
    assert len(oracle1) == 2  # cumulative

import numpy as np

from subphaser_tpu.config import (
    SGConfig,
    build_targets,
    group_indices,
    parse_configs,
    parse_idmap,
    update_sgs,
)


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_wheat_style_config(tmp_path):
    cfg = SGConfig.parse(
        write(tmp_path, "wheat.cfg", "Chr1A\tChr1B\tChr1D\nChr2A\tChr2B\tChr2D\n")
    )
    assert cfg.nsg == 3
    assert cfg.sgs == [
        [["Chr1A"], ["Chr1B"], ["Chr1D"]],
        [["Chr2A"], ["Chr2B"], ["Chr2D"]],
    ]
    assert cfg.chrs == ["Chr1A", "Chr1B", "Chr1D", "Chr2A", "Chr2B", "Chr2D"]


def test_rename_and_group_config(tmp_path):
    # Arabidopsis_suecica style: rename with |, group with commas
    text = "1|CM1.1\t6|CM6.1,7|CM7.1\n# comment line\n2|CM2.1,3|CM3.1\t8|CM8.1\n"
    cfg = SGConfig.parse(write(tmp_path, "as.cfg", text))
    assert cfg.nsg == 2
    assert cfg.sgs[0] == [["1|CM1.1"], ["6|CM6.1", "7|CM7.1"]]
    targets = build_targets(cfg.chrs)
    assert targets == {
        "CM1.1": "1", "CM6.1": "6", "CM7.1": "7",
        "CM2.1": "2", "CM3.1": "3", "CM8.1": "8",
    }
    sgs = update_sgs(cfg.sgs, targets)
    assert sgs[0] == [["1"], ["6", "7"]]
    labels = ["1", "6", "7", "2", "3", "8"]
    gi = group_indices(sgs, labels)
    assert gi[0] == [[0], [1, 2]]
    assert gi[1] == [[3, 4], [5]]


def test_parse_configs_multi(tmp_path):
    a = write(tmp_path, "a.cfg", "c1\tc2\n")
    b = write(tmp_path, "b.cfg", "d1\td2\td3\n")
    sgs, chrs, nsg = parse_configs([a, b])
    assert nsg == 5
    assert len(sgs) == 2
    assert chrs == ["c1", "c2", "d1", "d2", "d3"]


def test_parse_idmap(tmp_path):
    p = write(tmp_path, "map.txt", "old1 new1\nprefix|old2\n# comment\n")
    d = parse_idmap(p)
    assert d == {"old1": "new1", "prefix|old2": "old2"}
    assert parse_idmap(None) is None

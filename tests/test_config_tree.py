"""Our configs/ tree is file-for-file equivalent to the reference's.

For every YAML the reference ships, the same relative path must exist here
and produce the same fully-merged config (the reference uses the d2 eval tag
and duplicated model blocks; ours uses explicit tuples and chained _BASE_ —
the merged result must be identical)."""

import os

import pytest

from mp_former_tpu.config import (add_deeplab_config, add_maskformer2_config,
                                  add_maskformer2_video_config, get_cfg)

REF = "/root/reference/configs"
OURS = os.path.join(os.path.dirname(__file__), "..", "configs")

REF_FILES = sorted(
    os.path.relpath(os.path.join(dp, f), REF)
    for dp, _, fs in os.walk(REF) for f in fs if f.endswith(".yaml"))


def _load(root, rel):
    cfg = get_cfg()
    add_deeplab_config(cfg)
    add_maskformer2_config(cfg)
    add_maskformer2_video_config(cfg)
    cfg.merge_from_file(os.path.join(root, rel))
    return cfg


def _norm(obj):
    if isinstance(obj, (list, tuple)):
        return tuple(_norm(x) for x in obj)
    if isinstance(obj, dict):
        return {k: _norm(v) for k, v in obj.items()}
    return obj


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("rel", REF_FILES)
def test_config_matches_reference(rel):
    assert os.path.exists(os.path.join(OURS, rel)), f"missing configs/{rel}"
    ours = _norm(dict(_load(OURS, rel)))
    ref = _norm(dict(_load(REF, rel)))
    assert ours == ref, {
        k: (ref[k], ours.get(k)) for k in ref
        if _norm(ours.get(k)) != _norm(ref[k])}

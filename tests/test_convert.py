"""COLMAP ingestion wrapper (cli/convert.py) against a stub colmap binary.

The real colmap/magick executables are external (reference convert.py:31-123
shells out the same way); here a recording stub validates the pipeline
stages, flag propagation, the sparse/0 move, and the resize fan-out.
"""

import os
import stat
import sys

import pytest
from PIL import Image
import numpy as np

from mvs_gaussian_splatting_tpu.cli import convert


@pytest.fixture
def scene(tmp_path):
    src = tmp_path / "scene"
    os.makedirs(src / "input")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(src / "input" / "0.png")
    return src


@pytest.fixture
def stub_colmap(tmp_path, scene):
    """A fake colmap that records argv and fabricates undistorter outputs."""
    log = tmp_path / "colmap_calls.log"
    script = tmp_path / "colmap"
    script.write_text(f"""#!/bin/sh
echo "$@" >> {log}
case "$1" in
  image_undistorter)
    mkdir -p {scene}/sparse
    touch {scene}/sparse/cameras.bin {scene}/sparse/images.bin \
          {scene}/sparse/points3D.bin
    mkdir -p {scene}/images
    cp {scene}/input/0.png {scene}/images/0.png
    ;;
esac
exit 0
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return script, log


def test_full_pipeline(scene, stub_colmap):
    script, log = stub_colmap
    convert.main(["-s", str(scene), "--colmap_executable", str(script),
                  "--no_gpu"])
    calls = log.read_text().strip().splitlines()
    stages = [c.split()[0] for c in calls]
    assert stages == ["feature_extractor", "exhaustive_matcher", "mapper",
                      "image_undistorter"]
    # use_gpu propagated as 0
    assert "--SiftExtraction.use_gpu 0" in calls[0]
    assert "--ImageReader.camera_model OPENCV" in calls[0]
    # undistorter outputs moved into sparse/0
    assert os.path.exists(scene / "sparse" / "0" / "cameras.bin")
    assert not os.path.exists(scene / "sparse" / "cameras.bin")


def test_skip_matching(scene, stub_colmap):
    script, log = stub_colmap
    convert.main(["-s", str(scene), "--colmap_executable", str(script),
                  "--skip_matching"])
    stages = [c.split()[0] for c in log.read_text().strip().splitlines()]
    assert stages == ["image_undistorter"]


def test_resize_fanout(scene, stub_colmap, tmp_path):
    script, log = stub_colmap
    mlog = tmp_path / "magick_calls.log"
    magick = tmp_path / "magick"
    magick.write_text(f"#!/bin/sh\necho \"$@\" >> {mlog}\nexit 0\n")
    magick.chmod(magick.stat().st_mode | stat.S_IEXEC)
    convert.main(["-s", str(scene), "--colmap_executable", str(script),
                  "--magick_executable", str(magick), "--resize"])
    for d in ("images_2", "images_4", "images_8"):
        assert os.path.exists(scene / d / "0.png"), d
    mcalls = mlog.read_text().strip().splitlines()
    assert len(mcalls) == 3
    assert any("-resize 50%" in c for c in mcalls)
    assert any("-resize 12.5%" in c for c in mcalls)


def test_failed_stage_exits(scene, tmp_path):
    bad = tmp_path / "colmap"
    bad.write_text("#!/bin/sh\nexit 3\n")
    bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
    with pytest.raises(SystemExit):
        convert.main(["-s", str(scene), "--colmap_executable", str(bad)])

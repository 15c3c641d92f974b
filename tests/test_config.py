"""Config round-trips, including reference-format cfg_args interop.

The reference writes cfg_args as a stringified argparse Namespace
(train.py:172-173) and reads it back with eval()
(arguments/__init__.py:110-130). We parse it safely via the AST so our
render/metrics CLIs can drive model dirs trained by the reference.
"""

import pytest

from mvs_gaussian_splatting_tpu.train.config import (ModelConfig,
                                                     load_cfg_args,
                                                     parse_namespace_repr,
                                                     save_cfg_args)


class TestNamespaceRepr:
    def test_parses_reference_format(self):
        text = ("Namespace(sh_degree=3, source_path='/data/garden', "
                "model_path='./output/abc', images='images_4', "
                "resolution=-1, white_background=False, data_device='cuda', "
                "eval=True, grow_dir=True, num_dirs=128)")
        d = parse_namespace_repr(text)
        assert d["sh_degree"] == 3
        assert d["source_path"] == "/data/garden"
        assert d["eval"] is True
        assert d["grow_dir"] is True

    def test_rejects_code_execution(self):
        # eval() in the reference would execute this; we must not.
        with pytest.raises(ValueError):
            parse_namespace_repr("__import__('os').system('true')")

    def test_skips_non_literals(self):
        d = parse_namespace_repr("Namespace(a=1, b=open('/etc/passwd'))")
        assert d == {"a": 1}


class TestLoadCfgArgs:
    def test_json_roundtrip(self, tmp_path):
        cfg = ModelConfig(sh_degree=2, source_path="/s", eval=True)
        save_cfg_args(str(tmp_path), cfg)
        got = load_cfg_args(str(tmp_path))
        assert got.sh_degree == 2
        assert got.eval is True

    def test_reference_cfg_args_file(self, tmp_path):
        (tmp_path / "cfg_args").write_text(
            "Namespace(sh_degree=1, source_path='/data/fern', "
            "model_path='x', images='images', resolution=4, "
            "white_background=False, data_device='cuda', eval=True)")
        got = load_cfg_args(str(tmp_path))
        assert got.sh_degree == 1
        assert got.resolution == 4
        assert got.data_device == "tpu"  # cuda pin remapped

    def test_json_takes_precedence(self, tmp_path):
        save_cfg_args(str(tmp_path), ModelConfig(sh_degree=2))
        (tmp_path / "cfg_args").write_text("Namespace(sh_degree=1)")
        assert load_cfg_args(str(tmp_path)).sh_degree == 2

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_cfg_args(str(tmp_path))

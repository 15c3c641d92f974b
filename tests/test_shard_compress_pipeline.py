"""North-star config #5 integration: gauss-sharded training chained into
the codebook-compression CLI and offline exact rendering, as ONE pipeline
(scripts/sharded_compress_pipeline.py; VERDICT r4 next #4).

Every stage has its own unit tests (test_gauss_train, test_quantize,
test_compress_cli, test_rasterizer); this asserts the chain: training
improves PSNR, compression shrinks the artifact, and the dequantized model
renders within a bounded fidelity delta.
"""

import importlib.util
import os

import jax


def _load_pipeline():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts",
        "sharded_compress_pipeline.py")
    spec = importlib.util.spec_from_file_location("shard_compress", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_shard_compress_pipeline(tmp_path):
    mod = _load_pipeline()
    n_dev = min(8, len(jax.devices()))
    result = mod.run(str(tmp_path / "out"), n_dev=n_dev, width=96, height=96,
                     capacity=1024, iters=40, num_codes=64, log=lambda *_: None)
    # training moved the model toward the GT scene
    assert result["psnr_trained_loop_eval"] > result["psnr_init"] + 0.5
    # the offline render of the saved PLY reproduces the in-memory state
    assert abs(result["psnr_offline_raw_ply"]
               - result["psnr_trained_loop_eval"]) < 0.2
    # compression shrinks the artifact and costs bounded fidelity
    assert result["compressed_npz_bytes"] < result["raw_ply_bytes"]
    assert result["compression_delta_db"] < 3.0
    assert result["psnr_offline_compressed"] > result["psnr_init"]

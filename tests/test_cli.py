import numpy as np

from pcodec_tpu.cli import main


def test_cli_round_trip(tmp_path):
    nums = np.cumsum(np.random.default_rng(0).integers(0, 50, 5000)).astype(np.int64)
    inp = tmp_path / "in.npy"
    out_pco = tmp_path / "out.pco"
    out_npy = tmp_path / "out.npy"
    np.save(inp, nums)
    main(["compress", str(inp), str(out_pco)])
    main(["inspect", str(out_pco)])
    main(["decompress", str(out_pco), str(out_npy)])
    np.testing.assert_array_equal(np.load(out_npy), nums)


def test_cli_bench_csv(tmp_path):
    csv_path = tmp_path / "results.csv"
    main(["bench", "--n", "20000", "--iters", "1", "--csv", str(csv_path)])
    header = csv_path.read_text().splitlines()[0]
    # the reference's results CSV schema (docs/benchmark_results/*.csv)
    assert header == "input,codec,compress_dt,decompress_dt,compressed_size,uncompressed_size"


def test_simple_decompress_into():
    from pcodec_tpu import ChunkConfig, PagingSpec, simple_compress, simple_decompress_into

    nums = np.arange(600, dtype=np.int32)
    data = simple_compress(
        nums,
        ChunkConfig(compression_level=0, paging_spec=PagingSpec.equal_pages_up_to(300)),
    )
    for n_dst in [0, 256, 300, 556, 600, 601]:
        dst = np.zeros(n_dst, dtype=np.int32)
        progress = simple_decompress_into(data, dst)
        take = min(n_dst, 600)
        np.testing.assert_array_equal(dst[:take], nums[:take])
        assert progress.n_processed == take

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


def test_cli_inspect_container(tmp_path):
    nums = np.cumsum(np.random.default_rng(1).integers(0, 50, 30000)).astype(np.int64)
    inp = tmp_path / "in.npy"
    out_pct = tmp_path / "out.pct"
    np.save(inp, nums)
    main(["compress", str(inp), str(out_pct), "--format", "pct", "--page-n", "2048"])
    main(["inspect", str(out_pct), "--verbose"])


def test_inspect_container_accounting(tmp_path):
    from pcodec_tpu.codec.container import container_compress
    from pcodec_tpu.inspect_mod import inspect_file

    rng = np.random.default_rng(2)
    nums = rng.integers(0, 1000, 60000).astype(np.uint32)
    data = container_compress(nums, page_n=2048, chunk_n=25000)
    rep = inspect_file(data)
    assert rep.n_chunks == 3
    assert rep.total_n == 60000
    # every byte of the file is accounted for exactly
    accounted = rep.header_bytes + rep.meta_bytes + rep.page_bytes + rep.footer_bytes
    assert accounted == rep.total_bytes == len(data)
    assert all(cr.latent_vars for cr in rep.chunks)

    # empty container still inspectable
    rep0 = inspect_file(container_compress(np.array([], dtype=np.int64)))
    assert rep0.n_chunks == 0 and rep0.total_n == 0
    assert rep0.header_bytes == rep0.total_bytes


def test_cli_input_formats(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from scipy.io import wavfile

    vals = np.cumsum(np.random.default_rng(3).integers(0, 9, 1000)).astype(np.int64)
    pq.write_table(pa.table({"name": ["x"] * 1000, "vals": vals}), str(tmp_path / "t.parquet"))
    main(["compress", str(tmp_path / "t.parquet"), str(tmp_path / "t.pco")])
    main(["decompress", str(tmp_path / "t.pco"), str(tmp_path / "t.npy")])
    np.testing.assert_array_equal(np.load(tmp_path / "t.npy"), vals)

    samples = (np.sin(np.arange(4000) / 30.0) * 10000).astype(np.int16)
    wavfile.write(str(tmp_path / "a.wav"), 16000, samples)
    main(["compress", str(tmp_path / "a.wav"), str(tmp_path / "a.pco")])
    main(["decompress", str(tmp_path / "a.pco"), str(tmp_path / "a.npy")])
    np.testing.assert_array_equal(np.load(tmp_path / "a.npy"), samples)

    (tmp_path / "c.csv").write_text("ts,val\n" + "".join(f"{i},{i * 3}\n" for i in range(100)))
    main(["compress", str(tmp_path / "c.csv"), str(tmp_path / "c.pco"),
          "--col", "val", "--dtype", "i64"])
    main(["decompress", str(tmp_path / "c.pco"), str(tmp_path / "c.npy")])
    np.testing.assert_array_equal(np.load(tmp_path / "c.npy"), np.arange(100) * 3)

"""Kill-and-resume: a crawl stopped after wave K resumes from the _WAVE_OK
checkpoint (seen shards + politeness + frontier parquet) and produces
byte-identical final outputs (SURVEY.md §4 checkpoint/resume row)."""
import os
import shutil

import pyarrow.dataset as pads
import pytest


@pytest.fixture()
def interrupted_run(ray_session, tiny_corpus, tmp_path):
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    out = str(tmp_path / "out")
    cfg = flagship_config(seen_shards=2, politeness_shards=2)

    class StopAfter2(CrawlJob):
        def _run_wave(self, wave, *a, **kw):
            if wave >= 2:
                raise KeyboardInterrupt("killed mid-run")
            return super()._run_wave(wave, *a, **kw)

    job = StopAfter2(tiny_corpus, out, cfg)
    with pytest.raises(KeyboardInterrupt):
        job.run()
    return out, cfg


def _read_sorted(out):
    pages = pads.dataset(f"{out}/pages").to_table().sort_by("rank")
    return (pages["rank"].to_pylist(), pages["url"].to_pylist(),
            pages["depth"].to_pylist())


def test_resume_completes_identically(interrupted_run, tiny_corpus, tmp_path,
                                      ray_session):
    from seo_crawler_ray.pipelines.crawl import CrawlJob

    out, cfg = interrupted_run
    assert os.path.exists(f"{out}/_WAVE_1_OK")
    assert not os.path.exists(f"{out}/_WAVE_2_OK")

    # resume the killed run
    CrawlJob(tiny_corpus, out, cfg).run(resume=True)

    # reference: a clean uninterrupted run
    ref_out = str(tmp_path / "ref")
    CrawlJob(tiny_corpus, ref_out, cfg).run()

    assert _read_sorted(out) == _read_sorted(ref_out)
    links_a = pads.dataset(f"{out}/links").to_table()
    links_b = pads.dataset(f"{ref_out}/links").to_table()
    key = ["source_url", "target_url"]
    assert sorted(zip(*[links_a[c].to_pylist() for c in key])) == \
        sorted(zip(*[links_b[c].to_pylist() for c in key]))


def test_resume_discards_partial_wave(interrupted_run, tiny_corpus, ray_session):
    """Partially-written outputs beyond the last _WAVE_OK are dropped."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    out, cfg = interrupted_run
    # fake a partial wave-2 pages dir (as if the kill hit mid-write)
    os.makedirs(f"{out}/pages/wave=2", exist_ok=True)
    with open(f"{out}/pages/wave=2/garbage.parquet", "w") as f:
        f.write("not parquet")
    CrawlJob(tiny_corpus, out, cfg).run(resume=True)
    files = os.listdir(f"{out}/pages/wave=2")
    assert "garbage.parquet" not in files


def test_resume_with_delta_checkpoints(ray_session, tiny_corpus, tmp_path):
    """seen_checkpoint='delta' (per-wave new-keys-only snapshots — the
    10^10-scale mode) resumes to the same final crawl as a clean run."""
    from seo_crawler_ray.pipelines.crawl import CrawlJob
    from seo_crawler_ray.sources.cache import flagship_config

    cfg = flagship_config(seen_shards=2, politeness_shards=2,
                          seen_checkpoint="delta")

    class StopAfter2(CrawlJob):
        def _run_wave(self, wave, *a, **kw):
            if wave >= 2:
                raise KeyboardInterrupt("killed mid-run")
            return super()._run_wave(wave, *a, **kw)

    out = str(tmp_path / "delta")
    with pytest.raises(KeyboardInterrupt):
        StopAfter2(tiny_corpus, out, cfg).run()
    CrawlJob(tiny_corpus, out, cfg).run(resume=True)

    ref = str(tmp_path / "ref")
    CrawlJob(tiny_corpus, ref, cfg).run()
    assert _read_sorted(out) == _read_sorted(ref)

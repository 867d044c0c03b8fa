"""Multimodal actor-stage tests: real image path, stubbed audio/video
codecs with real plumbing (task brief: make schema/batch/actor
plumbing real and tested, stub only the codec internals)."""

import numpy as np
import pyarrow as pa
import pytest

from activity_files_ray import fixtures
from activity_files_ray.functions import imaging
from activity_files_ray.pipelines import multimodal as mm


@pytest.mark.usefixtures("ray_session")
class TestImageStages:
    def test_resize_stage(self):
        import ray.data as rd

        imgs = fixtures.make_images(6, seed=42)
        out = (
            rd.from_arrow(imgs)
            .map_batches(mm.ImageResizer, fn_constructor_kwargs={"target": 32},
                         batch_format="pyarrow", concurrency=1, batch_size=4)
            .to_pandas()
        )
        assert len(out) == 6
        assert (out["w"] == 32).all() and (out["h"] == 32).all()
        for b in out["bytes"]:
            assert imaging.decode_png(b).shape == (32, 32, 3)

    def test_feature_stage(self):
        import ray.data as rd

        imgs = fixtures.make_images(6, seed=42)
        out = (
            rd.from_arrow(imgs)
            .map_batches(mm.ImageFeatureExtractor, batch_format="pyarrow",
                         concurrency=1, batch_size=4)
            .to_pandas()
        )
        assert len(out) == 6
        # white background with a red line: mean_r near 255, g/b lower
        assert (out["mean_r"] > out["mean_g"]).all()
        assert (out["edge_density"] > 0).all()
        # phash equals the fixture's stored phash (decode parity)
        exp = imgs.to_pandas().set_index("image_id")["phash"]
        got = out.set_index("image_id")["phash"]
        assert (got == exp.loc[got.index]).all()


@pytest.mark.usefixtures("ray_session")
class TestAudioStage:
    def test_fake_codec_features(self):
        import ray.data as rd

        t = np.linspace(0, 1, 16000)
        sine = np.sin(2 * np.pi * 440 * t) * 0.5
        batch = pa.table(
            {
                "audio_id": ["a1", "a2"],
                "bytes": [
                    mm.encode_fake_audio(sine),
                    mm.encode_fake_audio(np.zeros(8000)),
                ],
                "codec": ["fpcm", "fpcm"],
            }
        )
        out = (
            rd.from_arrow(batch)
            .map_batches(mm.AudioFeatureExtractor, batch_format="pyarrow", concurrency=1)
            .to_pandas()
            .set_index("audio_id")
        )
        assert out.loc["a1", "duration_s"] == pytest.approx(1.0, abs=0.01)
        assert out.loc["a1", "rms"] == pytest.approx(0.5 / np.sqrt(2), abs=0.01)
        assert out.loc["a2", "rms"] == 0.0
        assert out["error"].isna().all()

    def test_real_codec_stubbed_not_fatal(self):
        import ray.data as rd

        batch = pa.table(
            {"audio_id": ["x"], "bytes": [b"ID3\x04fakemp3data"], "codec": ["mp3"]}
        )
        out = (
            rd.from_arrow(batch)
            .map_batches(mm.AudioFeatureExtractor, batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        assert "NotImplementedError" in out["error"].iloc[0]
        assert np.isnan(out["duration_s"].iloc[0])

    def test_direct_stub_raises(self):
        with pytest.raises(NotImplementedError, match="mp3"):
            mm._decode_audio(b"ID3\x04data", "mp3")


@pytest.mark.usefixtures("ray_session")
class TestVideoStage:
    def _video(self, n_frames=6, size=16):
        rng = np.random.default_rng(3)
        frames = [
            rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            for _ in range(n_frames)
        ]
        return frames, mm.encode_fake_video(frames)

    def test_frame_sampling(self):
        import ray.data as rd

        frames, payload = self._video(6)
        batch = pa.table(
            {"video_id": ["v1"], "bytes": [payload], "codec": ["fvid"]}
        )
        out = (
            rd.from_arrow(batch)
            .map_batches(mm.VideoFrameSampler, fn_constructor_kwargs={"every_nth": 2},
                         batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        assert out["frame_index"].tolist() == [0, 2, 4]
        # sampled frames decode back to the original pixels
        np.testing.assert_array_equal(
            imaging.decode_png(out["bytes"].iloc[1]), frames[2]
        )

    def test_real_codec_stubbed(self):
        import ray.data as rd

        batch = pa.table(
            {"video_id": ["v"], "bytes": [b"\x00\x00\x00 ftypmp42"], "codec": ["mp4"]}
        )
        out = (
            rd.from_arrow(batch)
            .map_batches(mm.VideoFrameSampler, batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        assert out["frame_index"].iloc[0] == -1
        assert "NotImplementedError" in out["error"].iloc[0]


@pytest.mark.usefixtures("ray_session")
class TestImageVerification:
    def test_verify_clean_and_corrupt_rows(self):
        import pyarrow as pa
        import ray.data as rd

        from activity_files_ray import fixtures
        from activity_files_ray.pipelines import multimodal as mm

        t = fixtures.make_images(12, seed=42)
        out = (
            rd.from_arrow(t)
            .map_batches(mm.verify_image_batch, batch_format="pyarrow", batch_size=4)
            .to_pandas()
        )
        assert len(out) == 12
        assert out[["ok_decode", "ok_pixels", "ok_caption", "ok_dims"]].all().all()
        # corrupt one payload + one phash: precise per-row failure
        tbl = t.to_pandas()
        tbl.loc[0, "bytes"] = b"\x00garbage"
        tbl.loc[1, "phash"] = tbl.loc[1, "phash"] ^ 0xFF
        out2 = (
            rd.from_pandas(tbl)
            .map_batches(mm.verify_image_batch, batch_format="pyarrow", batch_size=4)
            .to_pandas()
            .set_index("image_id")
        )
        assert not out2.loc["img_000000000000", "ok_decode"]
        assert not out2.loc["img_000000000001", "ok_pixels"]
        assert out2.loc["img_000000000001", "ok_decode"]
        assert out2.drop(["img_000000000000", "img_000000000001"])[
            ["ok_decode", "ok_pixels", "ok_caption", "ok_dims"]
        ].all().all()

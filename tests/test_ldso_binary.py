"""Reference-binary map format tests (io/ldso_binary.py vs
FullSystem::saveAll/loadAll, src/Frame.cc:121-200).

The cross-check test compiles the reference's OWN Frame/Feature/Point
save/load into a harness (glog/OpenCV type shims; unused sections GC'd)
and verifies both directions byte-for-byte semantically; it is skipped
when the reference tree or g++ is unavailable. The pure-python
round-trip always runs.
"""

import os
import shutil
import struct
import subprocess
import textwrap

import numpy as np
import pytest

from ldso_tpu.io.ldso_binary import load_ldso_binary, save_ldso_binary
from ldso_tpu.slam_map import FrameShell, GlobalMap, MapPointRecord

_REF = "/root/reference"


def _sample_map() -> GlobalMap:
    gm = GlobalMap()
    rng = np.random.RandomState(0)
    for k in range(3):
        kf = FrameShell(id=100 + k)
        kf.kf_id = k
        T = np.eye(4)
        T[:3, 3] = [0.1 * k, -0.05 * k, 0.02]
        kf.T_cw = T
        kf.feat_uv = rng.rand(4, 2).astype(np.float32) * 100
        kf.feat_desc = rng.randint(0, 256, (4, 32)).astype(np.uint8)
        kf.feat_idepth = np.array([0.5, -1.0, 0.8, -1.0], np.float32)
        kf.feat_angle = rng.rand(4).astype(np.float32)
        kf.map_points = [MapPointRecord(host_kf_id=k, u=5.0 + k, v=7.0,
                                        idepth=0.25)]
        if k > 0:
            S = np.eye(4)
            S[0, 3] = 0.1 * k
            kf.add_pose_rel(k - 1, S)
        gm.add_keyframe(kf)
    return gm


class TestPythonRoundTrip:
    @pytest.mark.smoke
    def test_save_load_roundtrip(self, tmp_path):
        gm = _sample_map()
        p = str(tmp_path / "map.bin")
        save_ldso_binary(gm, p)
        gm2 = load_ldso_binary(p)
        assert gm2.num_frames() == 3
        for k in range(3):
            a, b = gm.keyframes[k], gm2.keyframes[k]
            assert b.id == a.id and b.kf_id == a.kf_id
            np.testing.assert_allclose(b.T_cw, a.T_cw)
            np.testing.assert_allclose(b.feat_uv, a.feat_uv, rtol=1e-6)
            np.testing.assert_array_equal(b.feat_desc, a.feat_desc)
            # feature-attached depths + the standalone retired point
            assert len(b.map_points) == 3  # 2 feature depths + 1 retired
            for o in a.pose_rel:
                np.testing.assert_allclose(b.pose_rel[o][0], a.pose_rel[o][0])

    def test_save_is_idempotent(self, tmp_path):
        """save(load(save(x))) produces identical bytes: loaded feature
        depths are not double-written as retired points."""
        gm = _sample_map()
        p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
        save_ldso_binary(gm, p1)
        save_ldso_binary(load_ldso_binary(p1), p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_header_layout(self, tmp_path):
        """Byte-level spot check of the reference layout (Frame.cc:121-149)."""
        gm = GlobalMap()
        kf = FrameShell(id=42)
        kf.kf_id = 0
        gm.add_keyframe(kf)
        p = str(tmp_path / "h.bin")
        save_ldso_binary(gm, p)
        raw = open(p, "rb").read()
        # int32 nKF | u64 id | u64 kfId | 16 f64 | int32 nFeat | int32 nRel
        assert len(raw) == 4 + 8 + 8 + 128 + 4 + 4
        assert struct.unpack_from("<i", raw, 0)[0] == 1
        assert struct.unpack_from("<Q", raw, 4)[0] == 42
        T = np.frombuffer(raw, "<f8", 16, 20).reshape(4, 4)
        np.testing.assert_allclose(T, np.eye(4))


@pytest.mark.slow
class TestCrossFormatWithReference:
    """Compile the reference's own Frame::save/load and cross-check."""

    def _build_harness(self, tmp_path):
        if not os.path.isdir(_REF) or shutil.which("g++") is None:
            pytest.skip("reference tree or g++ unavailable")
        eigen = None
        try:
            import tensorflow
            eigen = os.path.join(os.path.dirname(tensorflow.__file__),
                                 "include")
        except Exception:
            pytest.skip("no bundled Eigen available")
        shim = tmp_path / "shim"
        (shim / "glog").mkdir(parents=True)
        (shim / "opencv2" / "core").mkdir(parents=True)
        (shim / "glog" / "logging.h").write_text(textwrap.dedent("""\
            #pragma once
            #include <iostream>
            #include <sstream>
            #include <cstdlib>
            namespace google { inline void InitGoogleLogging(const char*) {} }
            struct _LogStream {
                std::ostringstream ss; bool fatal;
                _LogStream(bool f=false):fatal(f){}
                template <class T> _LogStream& operator<<(const T& v){ ss<<v; return *this; }
                _LogStream& operator<<(std::ostream&(*m)(std::ostream&)){ ss<<m; return *this; }
                ~_LogStream(){ std::cerr<<ss.str(); if(fatal) std::abort(); }
            };
            #define LOG(severity) _LogStream(std::string(#severity)=="FATAL")
            #define CHECK(c) if(!(c)) _LogStream(true)
        """))
        (shim / "opencv2" / "core" / "core.hpp").write_text(textwrap.dedent("""\
            #pragma once
            #include <cstdint>
            #include <vector>
            #include <string>
            namespace cv {
            class Mat {
            public:
                Mat() {}
                Mat(int r, int c, int) : rows(r), cols(c) {}
                Mat row(int) const { return Mat(); }
                int rows = 0, cols = 0;
                bool empty() const { return true; }
                unsigned char* data = nullptr;
            };
            class FileStorage {};
            class FileNode {};
            }
            typedef unsigned char uchar;
            #define CV_8U 0
        """))
        inc = tmp_path / "inc"
        inc.mkdir()
        os.symlink(os.path.join(_REF, "thirdparty", "sophus"),
                   str(inc / "sophus"))
        os.symlink(os.path.join(_REF, "thirdparty", "DBoW3"),
                   str(inc / "DBoW3"))
        main = tmp_path / "main.cpp"
        main.write_text(textwrap.dedent("""\
            #include "Frame.h"
            #include "Feature.h"
            #include "Point.h"
            #include <fstream>
            #include <iostream>
            #include <vector>
            using namespace std;
            using namespace ldso;
            int main(int argc, char** argv) {
                if (argc >= 3 && string(argv[1]) == "load") {
                    ifstream fin(argv[2], ios::binary);
                    if (!fin) return 1;
                    int numKF = 0;
                    fin.read((char*)&numKF, sizeof(numKF));
                    vector<shared_ptr<Frame>> allKFs(numKF);
                    for (auto& kf : allKFs) kf = shared_ptr<Frame>(new Frame());
                    int i = 0;
                    while (!fin.eof() && i < (int)allKFs.size())
                        allKFs[i]->load(fin, allKFs[i], allKFs), i++;
                    cout << "nKF " << numKF << "\\n";
                    for (auto& kf : allKFs) {
                        int nvalid = 0;
                        for (auto& ft : kf->features)
                            if (ft->status == Feature::FeatureStatus::VALID) nvalid++;
                        cout << "kf " << kf->kfId << " id " << kf->id
                             << " feats " << kf->features.size()
                             << " valid " << nvalid
                             << " rel " << kf->poseRel.size()
                             << " tx " << kf->getPose().translation()[0] << "\\n";
                    }
                    return 0;
                }
                if (argc >= 3 && string(argv[1]) == "write") {
                    vector<shared_ptr<Frame>> kfs;
                    for (int k = 0; k < 2; k++) {
                        auto fr = shared_ptr<Frame>(new Frame());
                        fr->id = 10 + k; fr->kfId = k;
                        Mat44 T = Mat44::Identity();
                        T(0, 3) = 0.5 * k;
                        fr->setPose(SE3(T));
                        for (int j = 0; j < 3; j++) {
                            auto ft = shared_ptr<Feature>(
                                new Feature(10.f * j + k, 20.f + j, fr));
                            ft->invD = 0.5f + 0.1f * j;
                            ft->isCorner = true;
                            ft->angle = 0.3f * j;
                            for (int b = 0; b < 32; b++)
                                ft->descriptor[b] = (unsigned char)(j * 32 + b);
                            if (j < 2) {
                                ft->status = Feature::FeatureStatus::VALID;
                                ft->point = shared_ptr<Point>(new Point());
                            }
                            fr->features.push_back(ft);
                        }
                        kfs.push_back(fr);
                    }
                    Frame::RELPOSE rel;
                    Mat44 S = Mat44::Identity(); S(0, 3) = 0.123;
                    rel.Tcr = Sim3(S);
                    kfs[1]->poseRel[kfs[0]] = rel;
                    ofstream fout(argv[2], ios::out | ios::binary);
                    int nKF = (int)kfs.size();
                    fout.write((char*)&nKF, sizeof(int));
                    for (auto& fr : kfs) fr->save(fout);
                    return 0;
                }
                return 2;
            }
        """))
        exe = tmp_path / "refio"
        cmd = ["g++", "-O1", "-std=c++14", "-w", "-ffunction-sections",
               "-fdata-sections",
               "-include", "iostream", "-include", "string",
               "-include", "cstdint", "-include", "cstddef",
               f"-I{_REF}/include", f"-I{inc}", f"-I{eigen}", f"-I{shim}",
               str(main),
               f"{_REF}/src/Frame.cc", f"{_REF}/src/Feature.cc",
               f"{_REF}/src/Point.cc",
               f"{_REF}/thirdparty/DBoW3/src/BowVector.cpp",
               f"{_REF}/thirdparty/DBoW3/src/FeatureVector.cpp",
               "-Wl,--gc-sections", "-o", str(exe)]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            pytest.skip(f"harness build failed: {r.stderr[-500:]}")
        return str(exe)

    def test_two_way_cross_load(self, tmp_path):
        exe = self._build_harness(tmp_path)
        # reference writes -> python reads
        ref_map = str(tmp_path / "ref.map")
        subprocess.run([exe, "write", ref_map], check=True, timeout=60)
        gm = load_ldso_binary(ref_map)
        assert gm.num_frames() == 2
        assert gm.keyframes[1].id == 11
        assert abs(gm.keyframes[1].T_cw[0, 3] - 0.5) < 1e-12
        assert 0 in gm.keyframes[1].pose_rel
        assert abs(gm.keyframes[1].pose_rel[0][0][0, 3] - 0.123) < 1e-12
        assert gm.keyframes[0].feat_desc[1][0] == 32

        # python writes -> the reference's own Frame::load reads
        our_map = str(tmp_path / "ours.map")
        save_ldso_binary(gm, our_map)
        r = subprocess.run([exe, "load", our_map], capture_output=True,
                           text=True, check=True, timeout=60)
        lines = r.stdout.strip().splitlines()
        assert lines[0] == "nKF 2"
        assert "kf 1 id 11" in lines[2] and "rel 1" in lines[2]
        assert "tx 0.5" in lines[2]

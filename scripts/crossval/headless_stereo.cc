// Headless stereo driver for the reference build (scripts/crossval).
//
// Plays a directory of stereo PNG pairs through the reference
// ORB_SLAM2::System (viewer disabled) and saves the per-frame KITTI
// trajectory + TUM keyframe trajectory, so the repo's TPU rebuild can be
// cross-validated against the original C++ on the SAME synthetic frames
// (VERDICT r4 next-round #3).  The reference's own driver for this job
// is Examples/Stereo/stereo_kitti.cc; this one is ours — no GUI, no
// dataset-specific path logic, per-frame tracking-state log on stdout.
//
// Usage: headless_stereo <ORBvoc.txt> <settings.yaml> <seq_dir> <out_prefix>
//   seq_dir/left/%06d.png, seq_dir/right/%06d.png, seq_dir/times.txt
#include <algorithm>
#include <chrono>
#include <cstdio>
#include <numeric>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs/imgcodecs.hpp>

#include "System.h"

int main(int argc, char** argv) {
    if (argc != 5) {
        std::cerr << "usage: headless_stereo <voc> <yaml> <seq_dir> "
                  << "<out_prefix>\n";
        return 1;
    }
    const std::string voc = argv[1], yaml = argv[2], seq = argv[3],
                      out = argv[4];

    std::vector<double> times;
    {
        std::ifstream f(seq + "/times.txt");
        double t;
        while (f >> t) times.push_back(t);
    }
    if (times.empty()) {
        std::cerr << "no times.txt in " << seq << "\n";
        return 1;
    }

    ORB_SLAM2::System slam(voc, yaml, ORB_SLAM2::System::STEREO, false);

    std::vector<double> track_ms;
    track_ms.reserve(times.size());
    for (size_t i = 0; i < times.size(); ++i) {
        char name[64];
        std::snprintf(name, sizeof(name), "/%06zu.png", i);
        cv::Mat l = cv::imread(seq + "/left" + name, cv::IMREAD_GRAYSCALE);
        cv::Mat r = cv::imread(seq + "/right" + name, cv::IMREAD_GRAYSCALE);
        if (l.empty() || r.empty()) {
            std::cerr << "missing frame " << i << "\n";
            return 1;
        }
        auto t0 = std::chrono::steady_clock::now();
        slam.TrackStereo(l, r, times[i]);
        auto t1 = std::chrono::steady_clock::now();
        double ms = std::chrono::duration<double, std::milli>(t1 - t0)
                        .count();
        track_ms.push_back(ms);
        std::cout << "frame " << i << " state "
                  << slam.GetTrackingState() << " ms " << std::fixed
                  << std::setprecision(1) << ms << "\n";
    }

    slam.Shutdown();
    slam.SaveTrajectoryKITTI(out + "_traj_kitti.txt");
    slam.SaveKeyFrameTrajectoryTUM(out + "_kf_tum.txt");

    std::sort(track_ms.begin(), track_ms.end());
    std::cout << "median_ms " << track_ms[track_ms.size() / 2]
              << " mean_ms "
              << std::accumulate(track_ms.begin(), track_ms.end(), 0.0) /
                     track_ms.size()
              << "\n";
    return 0;
}

// Headless stand-ins for the reference's Viewer and MapDrawer
// (scripts/crossval).  Original files: src/Viewer.cc and src/MapDrawer.cc
// — both are Pangolin GUI code with no effect on SLAM state, excluded
// from this build.  These implementations satisfy the linker (System.cc
// constructs MapDrawer unconditionally and calls Viewer methods from
// Shutdown) while doing nothing.  All code here is ours.
#include "Viewer.h"
#include "MapDrawer.h"

namespace ORB_SLAM2 {

Viewer::Viewer(System* pSystem, FrameDrawer* pFrameDrawer,
               MapDrawer* pMapDrawer, Tracking* pTracking,
               const std::string& /*strSettingPath*/)
    : mpSystem(pSystem), mpFrameDrawer(pFrameDrawer),
      mpMapDrawer(pMapDrawer), mpTracker(pTracking),
      mT(33.0), mImageWidth(640), mImageHeight(480),
      mViewpointX(0), mViewpointY(0), mViewpointZ(0), mViewpointF(0),
      mbFinishRequested(false), mbFinished(true),
      mbStopped(true), mbStopRequested(false) {}

void Viewer::Run() { SetFinish(); }
void Viewer::RequestFinish() {
    std::unique_lock<std::mutex> lock(mMutexFinish);
    mbFinishRequested = true;
}
bool Viewer::CheckFinish() {
    std::unique_lock<std::mutex> lock(mMutexFinish);
    return mbFinishRequested;
}
void Viewer::SetFinish() {
    std::unique_lock<std::mutex> lock(mMutexFinish);
    mbFinished = true;
}
bool Viewer::isFinished() {
    std::unique_lock<std::mutex> lock(mMutexFinish);
    return mbFinished;
}
void Viewer::RequestStop() {
    std::unique_lock<std::mutex> lock(mMutexStop);
    mbStopRequested = true;
}
bool Viewer::isStopped() {
    std::unique_lock<std::mutex> lock(mMutexStop);
    return mbStopped;
}
bool Viewer::Stop() { return false; }
void Viewer::Release() {
    std::unique_lock<std::mutex> lock(mMutexStop);
    mbStopped = false;
}

MapDrawer::MapDrawer(Map* pMap, const std::string& /*strSettingPath*/)
    : mpMap(pMap), mKeyFrameSize(0.05f), mKeyFrameLineWidth(1.0f),
      mGraphLineWidth(0.9f), mPointSize(2.0f), mCameraSize(0.08f),
      mCameraLineWidth(3.0f) {}

void MapDrawer::DrawMapPoints() {}
void MapDrawer::DrawKeyFrames(const bool, const bool) {}
void MapDrawer::DrawCurrentCamera(pangolin::OpenGlMatrix&) {}
void MapDrawer::SetCurrentCameraPose(const cv::Mat& Tcw) {
    std::unique_lock<std::mutex> lock(mMutexCamera);
    mCameraPose = Tcw.clone();
}
void MapDrawer::SetReferenceKeyFrame(KeyFrame*) {}
void MapDrawer::GetCurrentOpenGLCameraMatrix(pangolin::OpenGlMatrix& M) {
    M.SetIdentity();
}

}  // namespace ORB_SLAM2

// Empty ROS cv_bridge stand-in: the reference's Tracking.cc includes
// this header but uses no symbol from it (vestigial ROS include in the
// fork); ROS is not installed in this image.
#ifndef CROSSVAL_CV_BRIDGE_STUB
#define CROSSVAL_CV_BRIDGE_STUB
#endif

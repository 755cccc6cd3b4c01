// OpenCV-1.x compatibility shim for the reference headless build:
// <opencv/cv.h> was removed in OpenCV 4.  The reference only needs the
// modern C++ API plus the C typedef/constant compat layers.
#ifndef CROSSVAL_OPENCV_CV_SHIM
#define CROSSVAL_OPENCV_CV_SHIM
#include <opencv2/opencv.hpp>
#include <opencv2/core/core_c.h>
#include <opencv2/imgproc/types_c.h>
#include <opencv2/imgproc/imgproc_c.h>
#endif

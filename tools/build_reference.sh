#!/bin/bash
# Build the UNMODIFIED reference SDVL (/root/reference) out-of-source, so its
# real throughput can be measured on this host (BASELINE.md "Measured
# baseline"). The reference tree is never written to.
#
# Environment quirks handled here:
#  * No system Eigen -> TensorFlow's vendored copy (headers only).
#  * OpenCV 4.6 dropped the 1.x-era <opencv/cv.h> umbrella header and the
#    CV_* constants the reference uses -> a shim header provides both.
#  * TF-Eigen's AVX512-FP16 kernels don't compile under this gcc with
#    -march=native -> -mno-avx512fp16 (no effect on the f64 math SDVL runs).
#  * Pangolin is absent -> GUI off (USE_GUI undefined, ui/*.cc excluded),
#    exactly the reference CMakeLists' non-GUI source set.
set -e
BUILD=${1:-/tmp/sdvlref}
REF=/root/reference
EIG=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null \
      || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)
OCV="$(pkg-config --cflags opencv4)"
OCVL="$(pkg-config --libs opencv4)"

mkdir -p "$BUILD/obj" "$BUILD/g2o_build" "$BUILD/shim/opencv"
printf '#ifndef G2O_CONFIG_H\n#define G2O_CONFIG_H\n#endif\n' > "$BUILD/g2o_build/config.h"
cat > "$BUILD/shim/opencv/cv.h" <<'EOF'
// OpenCV 1.x-era umbrella header shim for building the unmodified reference
// against OpenCV 4 (the reference includes <opencv/cv.h>, frame.h:30).
#pragma once
#include <opencv2/opencv.hpp>
#include <opencv2/imgproc/imgproc.hpp>
#include <opencv2/calib3d/calib3d.hpp>
#include <opencv2/video/tracking.hpp>
#ifndef CV_RANSAC
#define CV_RANSAC cv::RANSAC
#endif
#ifndef CV_CAP_PROP_FRAME_WIDTH
#define CV_CAP_PROP_FRAME_WIDTH cv::CAP_PROP_FRAME_WIDTH
#define CV_CAP_PROP_FRAME_HEIGHT cv::CAP_PROP_FRAME_HEIGHT
#define CV_CAP_PROP_FPS cv::CAP_PROP_FPS
#endif
#ifndef CV_AA
#define CV_AA cv::LINE_AA
#endif
#ifndef CV_BGR2GRAY
#define CV_BGR2GRAY cv::COLOR_BGR2GRAY
#define CV_GRAY2BGR cv::COLOR_GRAY2BGR
#define CV_RGB2GRAY cv::COLOR_RGB2GRAY
#endif
#ifndef CV_LOAD_IMAGE_GRAYSCALE
#define CV_LOAD_IMAGE_GRAYSCALE cv::IMREAD_GRAYSCALE
#define CV_LOAD_IMAGE_COLOR cv::IMREAD_COLOR
#define CV_LOAD_IMAGE_UNCHANGED cv::IMREAD_UNCHANGED
#endif
EOF
cp "$BUILD/shim/opencv/cv.h" "$BUILD/shim/opencv/cvaux.h"

CXX="g++ -O3 -march=native -mno-avx512fp16 -msse3 -std=c++14 -fpermissive -w -D_LINUX -D_REENTRANT"
INC="-I$REF -I$REF/extra -I$REF/extra/g2o -I$BUILD/g2o_build -I$BUILD/shim -I$EIG $OCV"

cd "$BUILD"
for f in $REF/extra/g2o/g2o/core/*.cpp $REF/extra/g2o/g2o/stuff/*.cpp $REF/extra/g2o/g2o/types/*.cpp; do
  b=$(basename "$f" .cpp)
  case $b in *_test) continue;; esac
  [ -f "obj/g2o_$b.o" ] || $CXX $INC -fPIC -c "$f" -o "obj/g2o_$b.o" &
done
wait
ar rcs obj/libg2o.a obj/g2o_*.o

for f in main sdvl video_source camera point frame feature config map homography_init image_align feature_align matcher; do
  [ -f "obj/$f.o" ] || $CXX $INC -c "$REF/$f.cc" -o "obj/$f.o" &
done
for f in se3 fast_detector orb_detector utils bundle; do
  [ -f "obj/x_$f.o" ] || $CXX $INC -c "$REF/extra/$f.cc" -o "obj/x_$f.o" &
done
wait
$CXX obj/main.o obj/sdvl.o obj/video_source.o obj/camera.o obj/point.o \
     obj/frame.o obj/feature.o obj/config.o obj/map.o obj/homography_init.o \
     obj/image_align.o obj/feature_align.o obj/matcher.o obj/x_*.o \
     obj/libg2o.a $OCVL -lpthread -o SDVL
echo "BUILD_OK: $BUILD/SDVL"

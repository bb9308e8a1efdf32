// No-op implementations of the Pangolin viewer classes so the reference
// links headless (DSOViewer.cc is excluded; pangolin/pangolin.h is the
// one-struct shim). Every run uses nogui=1, so none of these are hot.
#include "frontend/DSOViewer.h"

namespace ldso {

void KeyFrameDisplay::setFromKF(shared_ptr<internal::FrameHessian>,
                                shared_ptr<internal::CalibHessian>) {}
void KeyFrameDisplay::setFromF(shared_ptr<Frame>,
                               shared_ptr<internal::CalibHessian>) {}
bool KeyFrameDisplay::refreshPC(bool, float, float, int, float, int, bool) {
    return false;
}
void KeyFrameDisplay::drawCam(float, float *, float, bool) {}
void KeyFrameDisplay::drawPC(float) {}

PangolinDSOViewer::PangolinDSOViewer(int w_, int h_, bool) : w(w_), h(h_) {}
PangolinDSOViewer::~PangolinDSOViewer() {}
void PangolinDSOViewer::run() {}
void PangolinDSOViewer::close() {}
void PangolinDSOViewer::publishKeyframes(std::vector<shared_ptr<Frame>> &,
                                         bool,
                                         shared_ptr<internal::CalibHessian>) {}
void PangolinDSOViewer::publishCamPose(shared_ptr<Frame>,
                                       shared_ptr<internal::CalibHessian>) {}
void PangolinDSOViewer::join() {}
void PangolinDSOViewer::reset() {}
void PangolinDSOViewer::reset_internal() {}
void PangolinDSOViewer::saveAsPLYFile(const string &) {}

} // namespace ldso

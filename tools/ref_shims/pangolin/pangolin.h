// Minimal Pangolin shim: DSOViewer.h only declares two pangolin::GlBuffer
// members; DSOViewer.cc is excluded from the headless build and its class
// methods are stubbed in viewer_stub.cc.
#pragma once
namespace pangolin {
struct GlBuffer {};
} // namespace pangolin

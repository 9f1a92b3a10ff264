// Test-oracle binding: compiles the REFERENCE's self-contained COCOeval C++
// (detectron2/layers/csrc/cocoeval/cocoeval.cpp, 507 LoC — included from the
// read-only reference tree at build time, not copied) into a standalone
// pybind11 module so our numpy DetEval can be property-tested against the
// exact reference matching/accumulation (VERDICT round-1 item 7).
//
// The binding surface mirrors vision.cpp:100-108.
#include <pybind11/pybind11.h>
#include <pybind11/numpy.h>
#include <pybind11/stl.h>
#include <pybind11/stl_bind.h>

#include "cocoeval.h"  // from the reference csrc/cocoeval include dir

namespace py = pybind11;
using namespace detectron2;

PYBIND11_MODULE(ref_cocoeval, m) {
  m.def("COCOevalAccumulate", &COCOeval::Accumulate, "COCOeval::Accumulate");
  m.def("COCOevalEvaluateImages", &COCOeval::EvaluateImages,
        "COCOeval::EvaluateImages");
  py::class_<COCOeval::InstanceAnnotation>(m, "InstanceAnnotation")
      .def(py::init<uint64_t, double, double, bool, bool>());
  py::class_<COCOeval::ImageEvaluation>(m, "ImageEvaluation")
      .def(py::init<>());
}

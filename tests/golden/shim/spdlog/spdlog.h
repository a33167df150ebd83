// No-op spdlog shim: the golden generator only needs the logging macros to
// compile away. (Reference code logs mesh statistics through these.)
#ifndef GOLDEN_SPDLOG_SHIM_H
#define GOLDEN_SPDLOG_SHIM_H

#include <cstring>  // reference .cpp files use std::memcpy without including it
#include <memory>   // SdfFunction.h uses std::unique_ptr without including it
#include <cassert>     // builder headers use assert without including it
#include <functional>  // OctreeSdf.cpp uses std::function without including it

#define SPDLOG_INFO(...) ((void)0)
#define SPDLOG_WARN(...) ((void)0)
#define SPDLOG_ERROR(...) ((void)0)
#define SPDLOG_DEBUG(...) ((void)0)

#endif

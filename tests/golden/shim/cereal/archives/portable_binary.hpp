#ifndef GOLDEN_CEREAL_SHIM_PB_HPP
#define GOLDEN_CEREAL_SHIM_PB_HPP
#include "../cereal_shim.hpp"
#endif

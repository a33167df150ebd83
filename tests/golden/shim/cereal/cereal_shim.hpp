// Minimal functional cereal shim for the golden-value generator (test
// oracle only — never shipped). Implements just enough of cereal's
// PortableBinary archives to run the REFERENCE SdfLib save()/load()
// templates byte-compatibly on a little-endian host:
//
//   * archive construction writes/reads the 1-byte endianness flag;
//   * arithmetic values and enums are raw little-endian bytes;
//   * std::vector<T> is a uint64 count followed by the elements;
//   * std::array<T, N> is the elements only (no count);
//   * user types dispatch to member serialize()/save()/load() or an
//     ADL-found free serialize() (glm types via UsefullSerializations.h).
//
// This is an original implementation of the byte format (which
// sdflib_tpu/io/sdflib_binary.py documents field-by-field), not cereal
// code.
#ifndef GOLDEN_CEREAL_SHIM_HPP
#define GOLDEN_CEREAL_SHIM_HPP

#include <array>
#include <cstdint>
#include <cstring>
#include <istream>
#include <memory>   // SdfFunction.h uses std::unique_ptr without including it
#include <ostream>
#include <type_traits>
#include <vector>

namespace cereal {

template <typename A, typename T, typename = void>
struct has_member_serialize : std::false_type {};
template <typename A, typename T>
struct has_member_serialize<
    A, T,
    decltype(std::declval<T&>().serialize(std::declval<A&>()), void())>
    : std::true_type {};

template <typename A, typename T, typename = void>
struct has_member_save : std::false_type {};
template <typename A, typename T>
struct has_member_save<
    A, T, decltype(std::declval<const T&>().save(std::declval<A&>()), void())>
    : std::true_type {};

template <typename A, typename T, typename = void>
struct has_member_load : std::false_type {};
template <typename A, typename T>
struct has_member_load<
    A, T, decltype(std::declval<T&>().load(std::declval<A&>()), void())>
    : std::true_type {};

template <typename A, typename T, typename = void>
struct has_free_serialize : std::false_type {};
template <typename A, typename T>
struct has_free_serialize<
    A, T,
    decltype(serialize(std::declval<A&>(), std::declval<T&>()), void())>
    : std::true_type {};

class PortableBinaryOutputArchive {
public:
    explicit PortableBinaryOutputArchive(std::ostream& os) : mOs(os) {
        std::uint8_t littleEndian = 1;
        raw(&littleEndian, 1);
    }

    template <typename... Ts> PortableBinaryOutputArchive& operator()(Ts&&... ts) {
        int dummy[] = {0, (dispatch(ts), 0)...};
        (void)dummy;
        return *this;
    }

private:
    void raw(const void* p, std::size_t n) {
        mOs.write(reinterpret_cast<const char*>(p), n);
    }

    template <typename T>
    typename std::enable_if<std::is_arithmetic<T>::value>::type
    dispatch(const T& v) { raw(&v, sizeof(T)); }

    template <typename T>
    typename std::enable_if<std::is_enum<T>::value>::type
    dispatch(const T& v) {
        typename std::underlying_type<T>::type u =
            static_cast<typename std::underlying_type<T>::type>(v);
        raw(&u, sizeof(u));
    }

    template <typename T, typename Alloc>
    void dispatch(const std::vector<T, Alloc>& v) {
        std::uint64_t n = v.size();
        raw(&n, 8);
        for (const auto& e : v) dispatch(e);
    }

    template <typename T, std::size_t N>
    void dispatch(const std::array<T, N>& v) {
        for (const auto& e : v) dispatch(e);
    }

    template <typename T>
    typename std::enable_if<
        !std::is_arithmetic<T>::value && !std::is_enum<T>::value &&
        has_member_serialize<PortableBinaryOutputArchive, T>::value>::type
    dispatch(const T& v) { const_cast<T&>(v).serialize(*this); }

    template <typename T>
    typename std::enable_if<
        !std::is_arithmetic<T>::value && !std::is_enum<T>::value &&
        !has_member_serialize<PortableBinaryOutputArchive, T>::value &&
        has_member_save<PortableBinaryOutputArchive, T>::value>::type
    dispatch(const T& v) { v.save(*this); }

    template <typename T>
    typename std::enable_if<
        !std::is_arithmetic<T>::value && !std::is_enum<T>::value &&
        !has_member_serialize<PortableBinaryOutputArchive, T>::value &&
        !has_member_save<PortableBinaryOutputArchive, T>::value &&
        has_free_serialize<PortableBinaryOutputArchive, T>::value>::type
    dispatch(const T& v) { serialize(*this, const_cast<T&>(v)); }

    std::ostream& mOs;
};

class PortableBinaryInputArchive {
public:
    explicit PortableBinaryInputArchive(std::istream& is) : mIs(is) {
        std::uint8_t littleEndian = 0;
        raw(&littleEndian, 1);
    }

    template <typename... Ts> PortableBinaryInputArchive& operator()(Ts&&... ts) {
        int dummy[] = {0, (dispatch(ts), 0)...};
        (void)dummy;
        return *this;
    }

private:
    void raw(void* p, std::size_t n) {
        mIs.read(reinterpret_cast<char*>(p), n);
    }

    template <typename T>
    typename std::enable_if<std::is_arithmetic<T>::value>::type
    dispatch(T& v) { raw(&v, sizeof(T)); }

    template <typename T>
    typename std::enable_if<std::is_enum<T>::value>::type
    dispatch(T& v) {
        typename std::underlying_type<T>::type u{};
        raw(&u, sizeof(u));
        v = static_cast<T>(u);
    }

    template <typename T, typename Alloc>
    void dispatch(std::vector<T, Alloc>& v) {
        std::uint64_t n = 0;
        raw(&n, 8);
        v.resize(static_cast<std::size_t>(n));
        for (auto& e : v) dispatch(e);
    }

    template <typename T, std::size_t N>
    void dispatch(std::array<T, N>& v) {
        for (auto& e : v) dispatch(e);
    }

    template <typename T>
    typename std::enable_if<
        !std::is_arithmetic<T>::value && !std::is_enum<T>::value &&
        has_member_serialize<PortableBinaryInputArchive, T>::value>::type
    dispatch(T& v) { v.serialize(*this); }

    template <typename T>
    typename std::enable_if<
        !std::is_arithmetic<T>::value && !std::is_enum<T>::value &&
        !has_member_serialize<PortableBinaryInputArchive, T>::value &&
        has_member_load<PortableBinaryInputArchive, T>::value>::type
    dispatch(T& v) { v.load(*this); }

    template <typename T>
    typename std::enable_if<
        !std::is_arithmetic<T>::value && !std::is_enum<T>::value &&
        !has_member_serialize<PortableBinaryInputArchive, T>::value &&
        !has_member_load<PortableBinaryInputArchive, T>::value &&
        has_free_serialize<PortableBinaryInputArchive, T>::value>::type
    dispatch(T& v) { serialize(*this, v); }

    std::istream& mIs;
};

}  // namespace cereal

#endif  // GOLDEN_CEREAL_SHIM_HPP

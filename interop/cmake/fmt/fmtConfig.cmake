# Shim package: satisfies the reference's find_package(fmt) with the
# header-only mini-fmt in interop/shims (no network; see shims README).
if(NOT TARGET fmt::fmt)
    add_library(fmt::fmt INTERFACE IMPORTED)
    get_filename_component(_plssvm_shim_inc
        "${CMAKE_CURRENT_LIST_DIR}/../../shims/include" ABSOLUTE)
    set_target_properties(fmt::fmt PROPERTIES
        INTERFACE_INCLUDE_DIRECTORIES "${_plssvm_shim_inc}")
endif()
set(fmt_FOUND TRUE)

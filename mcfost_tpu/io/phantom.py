"""Phantom/sphNG binary dump reader (+ writer for round-trip tests).

Re-implements the sphNG/Phantom tagged block format from its structure
(reference reader: src/io_phantom_utils.f90:1124-1317 open/header,
:1922-1936 block headers, array blocks; consumed by
src/read_phantom.f90:13-458):

  record                    Fortran sequential records (i4 length-framed)
  -------------------------------------------------------------------
  int4 60769, real8, int4 60878, int4 version, int4 690706
  fileid (100 chars; fileid[1] == 'T' -> tagged format)
  8 x [ int4 n; if n>0: tags (n x 16 chars); values (n x dtype) ]
  int4 nblockarrays (= nblocks * narraylengths)
  per block: narraylengths x [ int8 nelem, 8 x int4 counts ]
  per block, per arraylength, per dtype, per array:
      tag (16 chars); data (nelem x dtype)

Unit conversion to mcfost-internal quantities follows
phantom_2_mcfost (src/read_phantom.f90:782-1247): positions to AU,
densities to g/cm^3, velocities to m/s; sink particles become stars.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import BinaryIO

import numpy as np

from .. import constants as cst

MAGIC1 = 60769
MAGIC2 = 60878
MAGIC3 = 690706

# datatype order of the 8 header/array groups
DTYPES = [np.dtype("<i4"), np.dtype("<i1"), np.dtype("<i2"),
          np.dtype("<i4"), np.dtype("<i8"), np.dtype("<f8"),
          np.dtype("<f4"), np.dtype("<f8")]

G_CGS = 6.67430e-8


def _read_rec(f: BinaryIO) -> bytes:
    raw = f.read(4)
    if len(raw) < 4:
        raise EOFError
    n = struct.unpack("<i", raw)[0]
    payload = f.read(n)
    f.read(4)
    return payload


def _write_rec(f: BinaryIO, payload: bytes):
    f.write(struct.pack("<i", len(payload)))
    f.write(payload)
    f.write(struct.pack("<i", len(payload)))


@dataclass
class PhantomDump:
    fileid: str = ""
    header: dict = field(default_factory=dict)   # tag -> scalar or array
    blocks: list = field(default_factory=list)   # [ [ {tag: array}, ...
                                                 #     per arraylength ] ]

    def hvalue(self, tag, default=None):
        v = self.header.get(tag, default)
        if isinstance(v, np.ndarray) and v.size == 1:
            return v.item()
        return v


def read_dump(path: str) -> PhantomDump:
    dump = PhantomDump()
    with open(path, "rb") as f:
        head = _read_rec(f)
        i1, _r1, i2, _ver, i3 = struct.unpack("<idiii", head)
        if i1 != MAGIC1:
            raise ValueError(f"not a Phantom dump (magic {i1})")
        if i2 != MAGIC2 or i3 != MAGIC3:
            raise ValueError("unsupported endianness or int/real size")
        dump.fileid = _read_rec(f).decode("ascii", "replace")
        tagged = len(dump.fileid) > 1 and dump.fileid[1] in "Tt"

        # global header: 8 datatype groups
        for dt in DTYPES:
            n = struct.unpack("<i", _read_rec(f)[:4])[0]
            if n <= 0:
                continue
            tags = [""] * n
            if tagged:
                raw = _read_rec(f)
                tags = [raw[16 * k:16 * (k + 1)].decode("ascii", "replace")
                        .strip() for k in range(n)]
            vals = np.frombuffer(_read_rec(f), dt, count=n)
            for k, t in enumerate(tags):
                if not t:
                    continue
                if t in dump.header:
                    dump.header[t] = np.append(np.atleast_1d(
                        dump.header[t]), vals[k])
                else:
                    dump.header[t] = vals[k]

        nblocks = int(dump.hvalue("nblocks", 1))
        number = struct.unpack("<i", _read_rec(f)[:4])[0]
        narraylengths = number // max(nblocks, 1)

        for _ib in range(nblocks):
            lengths, counts = [], []
            for _j in range(narraylengths):
                raw = _read_rec(f)
                nelem = struct.unpack("<q", raw[:8])[0]
                nums = struct.unpack("<8i", raw[8:40])
                lengths.append(nelem)
                counts.append(nums)
            groups = []
            for j in range(narraylengths):
                arrays = {}
                for it, dt in enumerate(DTYPES):
                    for _k in range(counts[j][it]):
                        tag = _read_rec(f).decode(
                            "ascii", "replace").strip()
                        data = np.frombuffer(_read_rec(f), dt,
                                             count=lengths[j])
                        arrays[tag] = data
                groups.append(arrays)
            dump.blocks.append(groups)
    return dump


def write_dump(path: str, header: dict, particle_arrays: dict,
               sink_arrays: dict | None = None,
               fileid: str = "FT:Phantom mcfost_tpu synthetic dump"):
    """Minimal tagged single-block writer (round-trip tests + interop)."""
    def classify(v):
        a = np.asarray(v)
        if a.dtype.kind == "f":
            return 5, np.float64    # 'real' group
        if a.dtype == np.int8:
            return 1, np.int8
        if a.dtype == np.int64:
            return 4, np.int64
        return 0, np.int32

    with open(path, "wb") as f:
        _write_rec(f, struct.pack("<idiii", MAGIC1, 1.0, MAGIC2, 1, MAGIC3))
        _write_rec(f, fileid.ljust(100)[:100].encode())

        groups: list[list] = [[] for _ in range(8)]
        for tag, v in header.items():
            gi, npdt = classify(v)
            groups[gi].append((tag, np.atleast_1d(np.asarray(v, npdt))))
        for gi, dt in enumerate(DTYPES):
            items = groups[gi]
            n = sum(a.size for _, a in items)
            _write_rec(f, struct.pack("<i", n))
            if n == 0:
                continue
            tags = b"".join(t.ljust(16)[:16].encode()
                            for t, a in items for _ in range(a.size))
            _write_rec(f, tags)
            _write_rec(f, np.concatenate(
                [a for _, a in items]).astype(dt).tobytes())

        narraylengths = 2 if sink_arrays else 1
        _write_rec(f, struct.pack("<i", narraylengths))   # nblocks=1

        def block_counts(arrays):
            cnt = [0] * 8
            for tag, v in arrays.items():
                gi, _ = classify(v)
                cnt[gi] += 1
            return cnt

        np_part = (len(next(iter(particle_arrays.values())))
                   if particle_arrays else 0)
        _write_rec(f, struct.pack("<q8i", np_part,
                                  *block_counts(particle_arrays)))
        if sink_arrays:
            ns = len(next(iter(sink_arrays.values())))
            _write_rec(f, struct.pack("<q8i", ns,
                                      *block_counts(sink_arrays)))

        for arrays in ([particle_arrays, sink_arrays] if sink_arrays
                       else [particle_arrays]):
            for gi, dt in enumerate(DTYPES):
                for tag, v in arrays.items():
                    if classify(v)[0] != gi:
                        continue
                    _write_rec(f, tag.ljust(16)[:16].encode())
                    _write_rec(f, np.asarray(v).astype(dt).tobytes())


@dataclass
class SPHModel:
    """Particles in mcfost units (phantom_2_mcfost,
    src/read_phantom.f90:782-1247)."""
    xyz: np.ndarray            # (N, 3) [AU]
    h: np.ndarray              # (N,) smoothing length [AU]
    mass: np.ndarray           # (N,) [g]
    rho_gas: np.ndarray        # (N,) [g/cm^3]
    vxyz: np.ndarray | None    # (N, 3) [m/s]
    dustfrac: np.ndarray | None  # (n_dust_types, N)
    star_xyz: np.ndarray       # (S, 3) [AU]
    star_mass: np.ndarray      # (S,) [Msun]
    time: float = 0.0
    dust_moments: np.ndarray | None = None  # (4, N) nucleation K0..K3
                                 # (read_phantom.f90:275-283); per-particle
                                 # grain size distributions reconstruct via
                                 # dust/moments.py (SPH2mcfost.f90:381)


def phantom_to_sph(dump: PhantomDump) -> SPHModel:
    """Unit conversion; verifies unit consistency by recomputing G from
    (udist, utime, umass) like the reference (read_phantom.f90:836-838)."""
    h = dump.header
    udist = float(np.atleast_1d(h["udist"])[0])       # cm
    umass = float(np.atleast_1d(h["umass"])[0])       # g
    utime = float(np.atleast_1d(h["utime"])[0])       # s
    g_code = udist ** 3 / (umass * utime ** 2)
    if abs(g_code - G_CGS) / G_CGS > 1e-3:
        raise ValueError("inconsistent phantom units: "
                         f"G={g_code:.4e} vs {G_CGS:.4e}")
    ulength_au = udist / cst.AU_to_cm
    uvel = udist / utime / 100.0                      # m/s

    part = dump.blocks[0][0]
    x = np.asarray(part["x"], np.float64)
    y = np.asarray(part["y"], np.float64)
    z = np.asarray(part["z"], np.float64)
    hsml = np.asarray(part["h"], np.float64)
    ok = hsml > 0                                     # dead particles: h<0
    n = ok.sum()
    xyz = np.stack([x, y, z], -1)[ok] * ulength_au

    hfact = float(np.atleast_1d(h.get("hfact", 1.2))[0])
    massoftype = np.atleast_1d(h["massoftype"]).astype(np.float64)
    itype = (np.asarray(part["itype"], np.int32)[ok]
             if "itype" in part else np.ones(n, np.int32))
    pmass = massoftype[np.clip(itype, 1, massoftype.size) - 1] * umass

    # rho = m (hfact/h)^3 in code units (Price 2012 eq. 10)
    rho_code = (massoftype[np.clip(itype, 1, massoftype.size) - 1]
                * (hfact / hsml[ok]) ** 3)
    rho_gas = rho_code * umass / udist ** 3           # g/cm^3

    vxyz = None
    if "vx" in part:
        vxyz = np.stack([part["vx"], part["vy"], part["vz"]],
                        -1)[ok] * uvel

    dustfrac = None
    dust_tags = sorted(t for t in part if t.startswith("dustfrac"))
    if dust_tags:
        dustfrac = np.stack([np.asarray(part[t], np.float64)[ok]
                             for t in dust_tags])

    # dust nucleation moments K0..K3 (phantom dust growth,
    # read_phantom.f90:275-283)
    dust_moments = None
    if all(f"K{k}" in part for k in range(4)):
        dust_moments = np.stack([np.asarray(part[f"K{k}"],
                                            np.float64)[ok]
                                 for k in range(4)])

    star_xyz = np.zeros((0, 3))
    star_mass = np.zeros(0)
    if len(dump.blocks[0]) > 1 and dump.blocks[0][1]:
        sink = dump.blocks[0][1]
        star_xyz = np.stack([sink["x"], sink["y"], sink["z"]],
                            -1) * ulength_au
        star_mass = np.asarray(sink["m"], np.float64) * umass / cst.Msun_to_g

    return SPHModel(xyz=xyz, h=hsml[ok] * ulength_au, mass=pmass,
                    rho_gas=rho_gas, vxyz=vxyz, dustfrac=dustfrac,
                    dust_moments=dust_moments,
                    star_xyz=star_xyz, star_mass=star_mass,
                    time=float(np.atleast_1d(h.get("time", 0.0))[0]))


def print_header(path: str):
    """-header_only: dump the phantom header tags and stop
    (lheader_only, init_mcfost.f90:1492-1495)."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"\x89HDF\r\n\x1a\n"):
        import h5py
        with h5py.File(path, "r") as h:
            def walk(name, obj):
                if hasattr(obj, "shape"):
                    v = obj[()] if obj.shape == () else f"array{obj.shape}"
                    print(f"  {name} = {v}")
            h["header"].visititems(walk)
        return
    dump = read_dump(path)
    for tag, v in dump.header.items():
        print(f"  {tag} = {v}")


def read_phantom_merged(paths, avg: bool = False) -> SPHModel:
    """-phantom-multi/-add/-avg: N dumps merged into one particle set
    (init_mcfost.f90:964-980).  add stacks the particles of every dump;
    avg requires time-matched dumps with identical particle counts and
    averages the per-particle fields (lphantom_avg)."""
    models = [read_phantom(p) for p in paths]
    if len(models) == 1:
        return models[0]
    if avg:
        n0 = models[0].xyz.shape[0]
        if any(m.xyz.shape[0] != n0 for m in models):
            raise SystemExit("-phantom-avg needs dumps with identical "
                             "particle counts")
        import dataclasses as _dc
        k = float(len(models))
        return _dc.replace(
            models[0],
            xyz=sum(m.xyz for m in models) / k,
            h=sum(m.h for m in models) / k,
            mass=sum(m.mass for m in models) / k,
            rho_gas=sum(m.rho_gas for m in models) / k,
            vxyz=(None if models[0].vxyz is None
                  else sum(m.vxyz for m in models) / k))
    cat = np.concatenate
    m0 = models[0]
    return SPHModel(
        xyz=cat([m.xyz for m in models]),
        h=cat([m.h for m in models]),
        mass=cat([m.mass for m in models]),
        rho_gas=cat([m.rho_gas for m in models]),
        vxyz=(None if any(m.vxyz is None for m in models)
              else cat([m.vxyz for m in models])),
        dustfrac=(None if any(m.dustfrac is None for m in models)
                  else cat([m.dustfrac for m in models], axis=1)),
        star_xyz=m0.star_xyz, star_mass=m0.star_mass, time=m0.time,
        dust_moments=(None if any(m.dust_moments is None for m in models)
                      else cat([m.dust_moments for m in models], axis=1)))


def read_phantom(path: str) -> SPHModel:
    """Fortran-binary or HDF5 phantom dump, dispatched on the HDF5 magic
    (reference: -phantom handles both, read_phantom.f90:63 vs :459)."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic.startswith(b"\x89HDF\r\n\x1a\n"):
        return read_phantom_hdf5(path)
    return phantom_to_sph(read_dump(path))


# ---------------------------------------------------------------------------
# Phantom HDF5 dumps (reference read_phantom.f90:459-780 + hdf5_utils.f90)
# ---------------------------------------------------------------------------

def read_phantom_hdf5(path: str) -> SPHModel:
    """Phantom HDF5 dump: groups header/particles/sinks with datasets
    nparttot, massoftype, hfact, umass/utime/udist; xyz (N,3), h, vxyz,
    itype, dustfrac (reference read_phantom.f90:579-700)."""
    import h5py
    with h5py.File(path, "r") as f:
        hdr = {k: np.asarray(v) for k, v in f["header"].items()}
        p = f["particles"]
        xyz = np.asarray(p["xyz"], np.float64)
        part = {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                "h": np.asarray(p["h"], np.float64)}
        if "itype" in p:
            part["itype"] = np.asarray(p["itype"], np.int32)
        if "vxyz" in p:
            v = np.asarray(p["vxyz"], np.float64)
            part["vx"], part["vy"], part["vz"] = v[:, 0], v[:, 1], v[:, 2]
        if "dustfrac" in p:
            df = np.atleast_2d(np.asarray(p["dustfrac"], np.float64))
            if df.shape[0] == part["h"].shape[0]:
                df = df.T
            for i in range(df.shape[0]):
                part[f"dustfrac{i or ''}"] = df[i]
        sink = {}
        if "sinks" in f and f["sinks"].get("xyz") is not None \
                and np.asarray(f["sinks"]["xyz"]).size:
            s = f["sinks"]
            sxyz = np.atleast_2d(np.asarray(s["xyz"], np.float64))
            sink = {"x": sxyz[:, 0], "y": sxyz[:, 1], "z": sxyz[:, 2],
                    "m": np.asarray(s["m"], np.float64),
                    "h": np.asarray(s["h"], np.float64)}
    dump = PhantomDump(fileid="FT:Phantom (HDF5)", header=hdr,
                       blocks=[[part, sink]])
    return phantom_to_sph(dump)


def write_dump_hdf5(path: str, header: dict, particle_arrays: dict,
                    sink_arrays: dict | None = None):
    """HDF5 writer matching read_phantom_hdf5's layout (round-trip tests
    + interop with phantom's --hdf5 builds)."""
    import h5py
    with h5py.File(path, "w") as f:
        g = f.create_group("header")
        for k, v in header.items():
            g.create_dataset(k, data=v)
        p = f.create_group("particles")
        n = len(particle_arrays["x"])
        p.create_dataset("xyz", data=np.stack(
            [particle_arrays["x"], particle_arrays["y"],
             particle_arrays["z"]], -1))
        p.create_dataset("h", data=np.asarray(particle_arrays["h"]))
        if "itype" in particle_arrays:
            p.create_dataset("itype", data=np.asarray(
                particle_arrays["itype"], np.int32))
        if "vx" in particle_arrays:
            p.create_dataset("vxyz", data=np.stack(
                [particle_arrays["vx"], particle_arrays["vy"],
                 particle_arrays["vz"]], -1))
        dust = [k for k in particle_arrays if k.startswith("dustfrac")]
        if dust:
            p.create_dataset("dustfrac", data=np.stack(
                [particle_arrays[k] for k in sorted(dust)]))
        if sink_arrays:
            s = f.create_group("sinks")
            s.create_dataset("xyz", data=np.stack(
                [sink_arrays["x"], sink_arrays["y"], sink_arrays["z"]], -1))
            s.create_dataset("m", data=np.asarray(sink_arrays["m"]))
            s.create_dataset("h", data=np.asarray(sink_arrays["h"]))
        _ = n

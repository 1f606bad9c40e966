"""Room sampling + RIR corpus generation.

Behavioral parity: /root/reference/scripts/sptk/rir_generate_1d.py /
rir_generate_2d.py — RoomGenerator samples room dimensions and RT60 (with
the Sabine feasibility check rt60_min = 24 V ln10 / (c S)) or absorption
coefficients, places a linear (1d) or planar (2d) array and speakers with
distance/DoA geometry constraints and retry budgets, generates RIRs, and
dumps a ``rir.json`` corpus description.  The RIR backend is this
framework's own engine (setk_tpu.sim.rir, native C++ or JAX) instead of
the reference's rir-simulate/pyrirgen/gpuRIR subprocess trio.
"""

import json
import random
from pathlib import Path

import numpy as np

from setk_tpu.sim.rir import rir_generate
from setk_tpu.sim.sampler import UniformSampler, parse_range
from setk_tpu.io.wave import write_wav
from setk_tpu.utils.logger import get_logger

logger = get_logger(__name__)

__all__ = ["Room", "RoomGenerator", "RirSimulator"]


class Room:
    """One sampled room: size + reverberation + array/speaker placement."""

    def __init__(self, length, width, height, rt60=None, refl=None):
        self.size = (length, width, height)
        self.rt60 = rt60
        self.refl = refl
        self.memo = (f"RT60={rt60:.2f}" if rt60 is not None
                     else f"Refl={refl:.2f}")
        self.rpos = []
        self.topo = None
        self.rcen = None
        self.spos = None

    def set_linear_mic(self, topo, center, vertical=False):
        """Place a linear array: topo = (x1, x2, ...) offsets."""
        mx, my, mz = center
        half = (topo[-1] - topo[0]) / 2
        if not vertical:
            self.rpos = [(mx - half + x, my, mz) for x in topo]
        else:
            self.rpos = [(mx, my - half + x, mz) for x in topo]
        self.topo = topo
        self.rcen = (mx, my)

    def set_planar_mic(self, topo, center):
        """Place a planar array: topo = [(x1, y1), ...] offsets."""
        mx, my, mz = center
        self.rpos = [(mx + x, my + y, mz) for (x, y) in topo]
        self.topo = topo
        self.rcen = (mx, my)

    def set_spk(self, pos):
        self.spos = pos

    def conf(self):
        rf = lambda f: round(f, 3)
        beta = (rf(self.rt60) if self.rt60 is not None
                else [rf(self.refl)] * 6)
        return {
            "beta": beta,
            "receiver_location": [tuple(rf(n) for n in p)
                                  for p in self.rpos],
            "room_size": [rf(n) for n in self.size],
            "receiver_geometric": self.topo,
        }

    def rir(self, sr=16000, rir_nsamps=4096, velocity=340.0,
            engine="native"):
        """(M, rir_nsamps) impulse responses for the current placement."""
        kwargs = dict(sr=sr, num_samples=rir_nsamps, velocity=velocity,
                      engine=engine, hp_filter=True)
        if self.rt60 is not None:
            if self.rt60 == 0:
                kwargs["beta"] = np.zeros(6)
            else:
                kwargs["t60"] = self.rt60
        else:
            kwargs["beta"] = np.full(6, self.refl)
        return rir_generate(list(self.size), list(self.spos),
                            [list(p) for p in self.rpos], **kwargs)

    def plot(self, speaker_cfgs, dest, room_id):
        """Top-down room layout figure (mics, array center, speakers)."""
        import matplotlib
        matplotlib.use("agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.set_aspect("equal", "box")
        length, width, _ = self.size
        ax.set_xlim((0, length))
        ax.set_ylim((0, width))
        ax.plot([p[0] for p in self.rpos], [p[1] for p in self.rpos], "k.")
        ax.plot([self.rcen[0]], [self.rcen[1]], "r+")
        ax.plot([c["pos"][0] for c in speaker_cfgs],
                [c["pos"][1] for c in speaker_cfgs], "k+")
        ax.set_xlabel(f"Length ({length:.2f}m)")
        ax.set_ylabel(f"Width ({width:.2f}m)")
        ax.set_title(f"{room_id} ({self.memo})")
        fig.savefig(dest, dpi=200)
        plt.close(fig)


class RoomGenerator:
    """Sample rooms from dimension ranges + RT60 (or absorption) ranges."""

    def __init__(self, rt60_range="", absc_range=(0.2, 0.8),
                 room_dim="4,6;8,10;2.4,3", rng=None):
        self.rng = rng or random
        self.rt60_range = rt60_range
        if rt60_range:
            self.rt60 = UniformSampler(rt60_range, rng=self.rng)
        else:
            self.absc = UniformSampler(absc_range, rng=self.rng)
        dims = room_dim.split(";")
        if len(dims) != 3:
            raise RuntimeError(f"Wrong format for room_dim={room_dim}")
        self.dim_sampler = [UniformSampler(d, rng=self.rng) for d in dims]

    def generate(self, velocity=340.0):
        """One Room, or None when the sampled geometry can't meet RT60."""
        length, width, height = (s.sample() for s in self.dim_sampler)
        if self.rt60_range:
            if self.rt60.max_value == 0:
                return Room(length, width, height, rt60=0)
            volume = length * width * height
            surface = (length * width + length * height +
                       width * height) * 2
            rt60_min = 24 * volume * np.log(10) / (velocity * surface)
            if rt60_min >= self.rt60.max_value:
                return None
            rt60 = self.rng.uniform(rt60_min, self.rt60.max_value)
            return Room(length, width, height, rt60=rt60)
        absc = self.absc.sample()
        return Room(length, width, height, refl=float(np.sqrt(1 - absc)))


class RirSimulator:
    """Sample rooms/arrays/speakers and write a RIR corpus + rir.json."""

    def __init__(self,
                 dump_dir,
                 array_topo,
                 geometry="linear",
                 room_dim="4,6;8,10;2.4,3",
                 rt60="0.2,0.7",
                 abs_range=(0.2, 0.8),
                 array_relx=(0.4, 0.6),
                 array_rely=(0.05, 0.1),
                 array_height=(1.2, 1.8),
                 speaker_height=(1.0, 2.0),
                 src_dist=(0.75, 3.0),
                 num_rooms=1,
                 num_rirs=1,
                 retry=5,
                 vertical=False,
                 rir_dur=0.5,
                 sr=16000,
                 speed=340.0,
                 engine="native",
                 plot=False,
                 seed=None):
        self.dump_dir = Path(dump_dir)
        self.dump_dir.mkdir(exist_ok=True, parents=True)
        self.rng = random.Random(seed)
        self.room_generator = RoomGenerator(rt60, abs_range, room_dim,
                                            rng=self.rng)
        self.geometry = geometry
        self.array_topo = array_topo
        self.mx, self.my = parse_range(array_relx), parse_range(array_rely)
        self.array_height = parse_range(array_height)
        self.speaker_height = parse_range(speaker_height)
        self.src_dist = parse_range(src_dist)
        self.num_rooms = num_rooms
        self.num_rirs = num_rirs
        self.retry = retry
        self.vertical = vertical
        self.rir_nsamps = int(sr * rir_dur)
        self.sr = sr
        self.speed = speed
        self.engine = engine
        self.plot = plot
        self.rirs_cfg = []

    def _place_mic(self, room):
        x, y, _ = room.size
        mx = self.rng.uniform(*(x * v for v in self.mx))
        my = self.rng.uniform(*(y * v for v in self.my))
        mz = self.rng.uniform(*self.array_height)
        if self.geometry == "linear":
            room.set_linear_mic(self.array_topo, (mx, my, mz),
                                vertical=self.vertical)
        else:
            room.set_planar_mic(self.array_topo, (mx, my, mz))
        return (mx, my), room

    @staticmethod
    def _max_src_dist(center, room_size_2d):
        mx, my = center
        rx, ry = room_size_2d
        corners = [(0, 0), (0, ry), (rx, 0), (rx, ry)]
        return max(((mx - x)**2 + (my - y)**2)**0.5 for x, y in corners)

    def _place_spk(self, center, room):
        done, ntry = 0, 0
        mx, my = center
        rx, ry, rz = room.size
        max_retry = self.retry * self.num_rirs
        min_dist, max_dist = self.src_dist
        max_dist = min(max_dist, self._max_src_dist((mx, my), (rx, ry)))
        rf = lambda f: round(f, 3)
        stats = []
        # linear arrays see DoAs in [0, 180); planar in [0, 360)
        doa_span = np.pi if self.geometry == "linear" else 2 * np.pi
        while ntry <= max_retry and done < self.num_rirs:
            ntry += 1
            sz = self.rng.uniform(*self.speaker_height)
            if sz >= rz:
                continue
            dst = self.rng.uniform(min_dist, max_dist)
            doa = self.rng.uniform(0, doa_span)
            if self.geometry == "linear" and self.vertical:
                sx = my - np.cos(doa) * dst
                sy = mx + np.sin(doa) * dst
            else:
                sx = mx + np.cos(doa) * dst
                sy = my + np.sin(doa) * dst
            if not (0 < sx < rx and 0 < sy < ry):
                continue
            done += 1
            stats.append({
                "pos": (rf(sx), rf(sy), rf(sz)),
                "doa": rf(doa * 180 / np.pi),
                "dst": rf(dst),
            })
        logger.info(f"Put speaker point: try/done = {ntry}/{done}")
        return done == self.num_rirs, stats

    def run_for_instance(self, room_id):
        room = None
        while room is None:
            room = self.room_generator.generate(velocity=self.speed)
        rpos, room = self._place_mic(room)
        succ, scfg = self._place_spk(rpos, room)
        if not succ:
            return False
        rcfg = room.conf()
        for idx, cfg in enumerate(scfg):
            cfg["loc"] = str(self.dump_dir / f"Room{room_id}-{idx + 1}.wav")
            room.set_spk(cfg["pos"])
            rir = room.rir(sr=self.sr, rir_nsamps=self.rir_nsamps,
                           velocity=self.speed, engine=self.engine)
            write_wav(cfg["loc"], rir, sr=self.sr)
        if self.plot:
            room.plot(scfg, self.dump_dir / f"Room{room_id}.jpg",
                      f"Room{room_id}")
        rcfg["spk"] = scfg
        self.rirs_cfg.append(rcfg)
        return True

    def run(self):
        done, ntry = 0, 0
        max_retry = self.retry * self.num_rooms
        while ntry <= max_retry and done < self.num_rooms:
            ntry += 1
            if self.run_for_instance(done + 1):
                done += 1
        with open(self.dump_dir / "rir.json", "w") as f:
            json.dump(self.rirs_cfg, f, indent=2)
        logger.info(f"Generated {self.num_rirs * done} rirs, "
                    f"{done} rooms done, try = {ntry}")
        return done

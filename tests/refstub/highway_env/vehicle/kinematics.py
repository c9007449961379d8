class Vehicle:
    """Render-only kinematic vehicle stub (reference CompLane.render)."""

    def __init__(self, road, position, heading=0.0, speed=0.0):
        self.road = road
        self.position = position
        self.heading = heading
        self.speed = speed
        self.check_collisions = True
        self.collidable = True

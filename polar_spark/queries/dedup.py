# placeholder — filled in below

#version 330 core

out vec4 out_color;

uniform vec3 u_box_color;

void main()
{
    out_color = vec4(u_box_color, 1.0);
}

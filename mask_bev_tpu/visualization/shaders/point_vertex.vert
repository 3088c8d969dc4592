#version 330 core
// Point-cloud vertex shader: positions + intensity in one vec4, per-point
// label color alongside. Render mode picks intensity-gray vs label color
// in the fragment stage (counterpart of the reference viewer's shaders).

layout (location = 0) in vec4 in_hit;     // x, y, z, intensity
layout (location = 1) in vec3 in_color;   // label color

out float frag_intensity;
out vec3 frag_color;

uniform mat4 u_proj;
uniform mat4 u_view;
uniform mat4 u_model;
uniform float u_point_size;

void main()
{
    gl_Position = u_proj * u_view * u_model * vec4(in_hit.xyz, 1.0);
    gl_PointSize = u_point_size;
    frag_intensity = in_hit.w;
    frag_color = in_color;
}
